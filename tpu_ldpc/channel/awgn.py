"""BPSK modulation + AWGN channel + LLR computation (SURVEY.md C5).

Conventions (shared with the golden model and all tests):
  x = 1 - 2c               (bit 0 -> +1, bit 1 -> -1)
  sigma^2 = 1 / (2 * R * 10^(EbN0_dB / 10))
  y = x + sigma * N(0, 1)
  llr = 2 y / sigma^2      (positive favors bit 0)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def noise_sigma2(ebn0_db, rate: float):
    """Noise variance; ebn0_db may be a python float or a traced scalar."""
    return 1.0 / (2.0 * rate * 10.0 ** (ebn0_db / 10.0))


def bpsk(c):
    return 1.0 - 2.0 * c.astype(jnp.float32)


def awgn_llrs(key, c, ebn0_db, rate: float):
    """Modulate codewords, add AWGN, return channel LLRs (batch, n).

    ebn0_db may be a traced scalar so one compiled step serves a whole
    Eb/N0 sweep."""
    sigma2 = jnp.asarray(noise_sigma2(ebn0_db, rate), jnp.float32)
    x = bpsk(c)
    y = x + jnp.sqrt(sigma2) * jax.random.normal(key, x.shape, dtype=jnp.float32)
    return (2.0 / sigma2) * y
