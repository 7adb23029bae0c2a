"""Binary symmetric channel (hard-output channel model).

Companion to the hard-decision decoders (decode/hard.py): each
transmitted bit flips independently with probability p.  Receivers are
fed LLRs so the same decoder interface serves both channels:
llr = (1 - 2*y) * log((1-p)/p) — every position carries the same
magnitude, so bit-flipping decoders see pure hard decisions while BP
decoders can also run (BSC is then just a 2-level LLR quantizer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bsc_llr_magnitude(p: float) -> float:
    """Per-bit LLR magnitude log((1-p)/p) of a crossover-p BSC."""
    if not 0.0 < p < 0.5:
        raise ValueError(f"crossover probability must be in (0, 0.5), got {p}")
    return float(np.log((1.0 - p) / p))


def bsc_llrs(key, c, p: float):
    """Transmit codewords c (batch, n) over a BSC(p); return LLRs."""
    mag = bsc_llr_magnitude(p)
    flips = jax.random.bernoulli(key, p, c.shape)
    y = c.astype(jnp.int32) ^ flips.astype(jnp.int32)
    return (1.0 - 2.0 * y.astype(jnp.float32)) * mag
