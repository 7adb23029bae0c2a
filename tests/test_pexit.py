"""PEXIT threshold analysis tests (codes/pexit.py).

Anchors: the (3,6)-regular rate-1/2 ensemble has a BP threshold of
~1.11 dB (textbook density-evolution result); no threshold may beat the
rate-1/2 BPSK-AWGN Shannon limit of ~0.19 dB (BASELINE.md sanity floor).
"""

import numpy as np
import pytest

from tpu_ldpc.codes.pexit import (
    J,
    J_inv,
    parity_mask,
    pexit_converges,
    pexit_threshold,
    search_mask,
)


def test_j_inverse_roundtrip():
    s = np.linspace(0.01, 10.0, 200)
    np.testing.assert_allclose(J_inv(J(s)), s, rtol=1e-9)
    assert J(0.0) == 0.0
    assert J(50.0) > 0.999999


def test_regular_36_threshold_matches_textbook():
    th = pexit_threshold(np.ones((3, 6), bool), step=0.02)
    assert abs(th - 1.11) < 0.2


def test_threshold_above_shannon_limit():
    # any rate-1/2 mask: threshold must exceed the 0.19 dB Shannon limit
    mask, _ = parity_mask(6, 12)
    mask[:, :6] |= np.eye(6, dtype=bool)
    mask[:, :6] |= np.roll(np.eye(6, dtype=bool), 1, axis=0)
    mask[:, :6] |= np.roll(np.eye(6, dtype=bool), 3, axis=0)
    th = pexit_threshold(mask)
    assert 0.19 < th < 4.0


def test_converges_monotone_in_snr():
    mask = np.ones((3, 6), bool)
    ok = pexit_converges(mask, np.array([0.5, 1.11 + 0.4, 3.0]))
    assert not ok[0] and ok[1] and ok[2]


def test_search_improves_threshold():
    mb, nb = 6, 12
    mask0, _ = parity_mask(mb, nb)
    rng = np.random.default_rng(0)
    for j in range(nb - mb):
        rows = rng.choice(mb, size=3, replace=False)
        mask0[rows, j] = True
    th0 = pexit_threshold(mask0)
    mask, stats = search_mask(
        mb, nb, seed=3, steps=120,
        threshold_kwargs=dict(lo=0.2, hi=2.0, step=0.1, max_iters=200),
    )
    assert stats["threshold_db"] <= th0 + 1e-9
    # structural constraints hold
    kb = nb - mb
    assert (mask[:, :kb].sum(axis=0) >= 3).all()
    pm, _ = parity_mask(mb, nb)
    np.testing.assert_array_equal(mask[:, kb:], pm[:, kb:])


def test_sc_ldpc_threshold_saturation():
    """Spatial coupling improves the BP threshold below the uncoupled
    (3,6) ensemble's 1.11 dB as the chain grows (the textbook
    saturation effect; the rate also drifts toward 1/2 from below as
    termination overhead amortizes)."""
    from tpu_ldpc.codes.base_graphs import make_sc_base_graph

    B = make_sc_base_graph(32, 16, seed=9)
    th = pexit_threshold(B >= 0, step=0.05, lo=0.2, hi=1.6)
    assert th < 1.0
    B8 = make_sc_base_graph(8, 16, seed=9)
    th8 = pexit_threshold(B8 >= 0, step=0.05, lo=0.2, hi=1.6)
    assert th < th8  # longer chain -> better threshold
