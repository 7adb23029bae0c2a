"""Device-decoder-vs-golden equivalence (SURVEY.md §4.2).

Min-sum in float32 is asserted *bit-exact* against the golden model
(identical bits, ok flags, and iters_used on identical LLRs) — the
strongest form of the paired-seed strategy: zero Monte-Carlo slack.
Sum-product is compared at frame level (transcendental tolerance).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tpu_ldpc.codes import LdpcCode, make_base_graph
from tpu_ldpc.golden import decode as golden_decode, encode as golden_encode
from tpu_ldpc.decode.reference import decode as jnp_decode


def toy_code():
    return LdpcCode.from_base_graph(make_base_graph(4, 8, 4, seed=7), 4, "toy")


def noisy_llrs(code, batch, ebn0_db, seed):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 2, (batch, code.k)).astype(np.uint8)
    c = golden_encode(code.H, u)
    x = 1.0 - 2.0 * c
    sigma2 = 1.0 / (2 * code.rate * 10 ** (ebn0_db / 10))
    y = x + np.sqrt(sigma2) * rng.normal(size=x.shape)
    return (2.0 / sigma2 * y).astype(np.float32), u


CODES = [
    ("toy", toy_code),
    ("judged", LdpcCode.judged),
    ("wifi23", lambda: LdpcCode.from_family("wifi", "2/3", 27)),
]


ALPHA_BETA = [(0.75, 0.0), (1.0, 0.0), (1.0, 0.15), (0.8, 0.1)]
# alpha/beta arithmetic coverage comes from the cheap codes; the big
# wifi23 code (golden is a slow per-frame Python loop at n=1944) checks
# the operating config only — the parameter handling is code-independent
# wifi23 (n=1944 golden python loop) is the suite's slowest single
# bit-exact case; the contract it re-covers (jnp == golden on a family
# cell) is axis-redundant with toy+judged -> deep (VERDICT r2 #5)
PAIRS = [
    pytest.param(name, make, a, b,
                 marks=(pytest.mark.deep,) if name == "wifi23" else ())
    for name, make in CODES
    for a, b in (ALPHA_BETA if name != "wifi23" else ALPHA_BETA[:1])
]


@pytest.mark.parametrize(
    "name,make,alpha,beta", PAIRS,
    ids=[f"{p.values[0]}-{p.values[2]}-{p.values[3]}" for p in PAIRS],
)
def test_minsum_bitexact_vs_golden(name, make, alpha, beta):
    code = make()
    llr, _ = noisy_llrs(code, 32 if name != "wifi23" else 16, 2.0, seed=17)
    gb, gok, git = golden_decode(
        code.H, llr, algo="minsum", iters=25, alpha=alpha, beta=beta,
        dtype=np.float32,
    )
    jb, jok, jit = map(
        np.asarray,
        jnp_decode(code, llr, algo="minsum", iters=25, alpha=alpha, beta=beta),
    )
    assert (jb == gb).all()
    assert (jok == gok).all()
    assert (jit == git).all()


def test_layered_minsum_bitexact_vs_golden():
    code = toy_code()
    llr, _ = noisy_llrs(code, 48, 3.0, seed=23)
    gb, gok, git = golden_decode(
        code.H, llr, algo="minsum", schedule="layered", iters=20,
        dtype=np.float32,
    )
    jb, jok, jit = map(
        np.asarray,
        jnp_decode(code, llr, algo="minsum", schedule="layered", iters=20),
    )
    assert (jb == gb).all()
    assert (jok == gok).all()
    assert (jit == git).all()


@pytest.mark.parametrize("schedule", ["flooding", "layered"])
def test_sumproduct_agrees_with_golden(schedule):
    code = toy_code()
    llr, _ = noisy_llrs(code, 64, 4.0, seed=29)
    gb, gok, git = golden_decode(
        code.H, llr, algo="sumproduct", schedule=schedule, iters=30
    )
    jb, jok, jit = map(
        np.asarray,
        jnp_decode(code, llr, algo="sumproduct", schedule=schedule, iters=30),
    )
    assert (jb == gb).all(axis=1).mean() >= 0.97
    assert (jok == gok).mean() >= 0.97


@pytest.mark.deep
def test_sumproduct_judged_frame_agreement():
    code = LdpcCode.judged()
    llr, _ = noisy_llrs(code, 24, 2.0, seed=31)
    gb, gok, _ = golden_decode(code.H, llr, algo="sumproduct", iters=30)
    jb, jok, _ = map(
        np.asarray, jnp_decode(code, llr, algo="sumproduct", iters=30)
    )
    assert (jb == gb).all(axis=1).mean() >= 0.95
    assert (jok == gok).mean() >= 0.95


def test_early_stop_vs_no_early_stop():
    """Without early stop, converged codewords keep iterating but should
    still end on a valid codeword at this SNR (BP is stable here)."""
    code = toy_code()
    llr, _ = noisy_llrs(code, 32, 6.0, seed=37)
    b1, ok1, it1 = map(
        np.asarray, jnp_decode(code, llr, algo="minsum", iters=15)
    )
    b2, ok2, it2 = map(
        np.asarray,
        jnp_decode(code, llr, algo="minsum", iters=15, early_stop=False),
    )
    assert (it2 == 15).all()
    assert ok1.mean() > 0.9
    # early-stopped results are themselves valid codewords
    from tpu_ldpc.golden import syndrome_ok

    assert syndrome_ok(code.H, b1)[ok1].all()


@settings(max_examples=20, deadline=None)
@given(
    data=st.lists(
        st.floats(
            min_value=-60.0, max_value=60.0,
            allow_nan=False, allow_infinity=False, width=32,
        ),
        min_size=32, max_size=32,
    )
)
def test_minsum_fuzz_llrs_bitexact(data):
    """Property-based: arbitrary finite LLRs decode identically (SURVEY §4.2).

    Magnitudes below 1e-4 are snapped to +0.0: XLA flushes denormals
    (FTZ) while NumPy keeps them, so adversarially tiny inputs diverge
    at the denormal boundary — a platform-semantics difference, not a
    decoder bug, and unreachable from the AWGN channel.  (abs() also
    maps -0.0 to +0.0: the Pallas kernel uses sign-bit semantics where
    -0.0 counts as negative, equally unreachable in practice.)
    """
    code = toy_code()
    data = [v if abs(v) >= 1e-4 else 0.0 for v in data]
    llr = np.asarray(data, dtype=np.float32)[None, :]
    gb, gok, git = golden_decode(
        code.H, llr, algo="minsum", iters=10, dtype=np.float32
    )
    jb, jok, jit = map(np.asarray, jnp_decode(code, llr, algo="minsum", iters=10))
    assert (jb == gb).all()
    assert (jok == gok).all()
    assert (jit == git).all()


def test_sumproduct_no_nans_on_extreme_llrs():
    """SP's phi/atanh domain is clamped (SP_MIN_MAG..SP_MAX_MAG): the
    sanitizer promise of SURVEY §5 — decode extreme inputs (huge
    magnitudes, exact zeros, mixed) under jax_debug_nans and require
    finite posteriors on every schedule."""
    import jax

    code = toy_code()
    n = code.n
    rows = [
        np.full(n, 1e30, np.float32),
        np.full(n, -1e30, np.float32),
        np.zeros(n, np.float32),
        np.asarray([(1e20 if i % 2 else -1e20) for i in range(n)], np.float32),
        np.asarray([0.0 if i % 3 else 1e-30 for i in range(n)], np.float32),
    ]
    llr = np.stack(rows)
    jax.config.update("jax_debug_nans", True)
    try:
        for schedule in ("flooding", "layered"):
            bits, ok, iu = map(
                np.asarray,
                jnp_decode(code, llr, algo="sumproduct", iters=8,
                           schedule=schedule),
            )
            assert bits.shape == llr.shape
            assert np.isfinite(iu).all()
        gb, gok, _ = golden_decode(code.H, llr, algo="sumproduct", iters=8)
        assert gb.shape == llr.shape
    finally:
        jax.config.update("jax_debug_nans", False)
