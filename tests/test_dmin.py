"""Minimum-distance tools (codes/dmin.py): exact enumeration anchored
on known-answer codes, information-set search and decoder-impulse
bounds validated against it."""

import numpy as np
import pytest

from tpu_ldpc.codes import LdpcCode, make_base_graph
from tpu_ldpc.codes.dmin import (
    dmin_exact,
    dmin_upper_bound,
    estimate_dmin_impulse,
    gf2_nullspace_basis,
)

HAMMING_H = np.array([[1, 1, 0, 1, 1, 0, 0],
                      [1, 0, 1, 1, 0, 1, 0],
                      [0, 1, 1, 1, 0, 0, 1]], np.uint8)


@pytest.fixture(scope="module")
def tiny_qc():
    return LdpcCode.from_base_graph(make_base_graph(4, 6, 4, seed=5), 4)


def test_nullspace_basis_properties(tiny_qc):
    from tpu_ldpc.golden.encoder import gf2_rank

    for H in (HAMMING_H, np.asarray(tiny_qc.H.todense(), np.uint8)):
        B = gf2_nullspace_basis(H)
        assert B.shape[0] == H.shape[1] - gf2_rank(H)
        assert (H.astype(np.int64) @ B.T.astype(np.int64) % 2 == 0).all()
        # systematic over the free columns => rows linearly independent
        assert gf2_rank(B) == B.shape[0]


def test_nullspace_rank_deficient():
    """Duplicated rows (rank-deficient H) enlarge the nullspace."""
    H = np.vstack([HAMMING_H, HAMMING_H[:1]])
    B = gf2_nullspace_basis(H)
    assert B.shape[0] == 4  # same code as Hamming: rank 3, n=7
    assert (H.astype(np.int64) @ B.T.astype(np.int64) % 2 == 0).all()


def test_native_row_reduce_matches_golden():
    """The ISD hot loop routes through the native bit-packed RREF when
    available; RREF is canonical (unique), so native and golden must
    agree exactly — rref AND recovered pivot columns."""
    from tpu_ldpc import _native
    from tpu_ldpc.golden.encoder import gf2_row_reduce

    if _native.lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    for shape in ((3, 7), (12, 30), (20, 20), (8, 40)):
        M = rng.integers(0, 2, shape).astype(np.uint8)
        gr, gp = gf2_row_reduce(M)
        nr, np_ = _native.gf2_row_reduce(M)
        assert np.array_equal(gr, nr)
        assert list(gp) == list(np_)


def test_dmin_exact_hamming():
    assert dmin_exact(HAMMING_H) == 3


def test_dmin_exact_tiny_qc(tiny_qc):
    assert dmin_exact(tiny_qc.H.toarray(), max_dim=10) == 4


def test_dmin_exact_refuses_large():
    code = LdpcCode.judged()
    with pytest.raises(ValueError):
        dmin_exact(code.H.toarray())


def test_isd_bound_exact_on_tiny(tiny_qc):
    """The information-set search reaches the exact d_min on anchored
    codes and returns a verified certificate codeword."""
    w, c, st = dmin_upper_bound(HAMMING_H, restarts=30, seed=1)
    assert w == 3 and c.sum() == 3
    H = tiny_qc.H.toarray()
    w, c, st = dmin_upper_bound(H, restarts=30, seed=1)
    assert w == 4
    assert (H.astype(np.int64) @ c.astype(np.int64) % 2 == 0).all()
    assert c.sum() == 4


def test_isd_bound_target_early_stop():
    w, _, st = dmin_upper_bound(HAMMING_H, restarts=1000, seed=0, target=3)
    assert w == 3
    assert st["restarts"] < 1000


def test_isd_bound_judged_smoke():
    """A couple dozen restarts already certifies a low bound on the
    judged code (measured: weight 18 inside 20 restarts; allow seed
    slack in the assertion)."""
    code = LdpcCode.judged()
    w, c, _ = dmin_upper_bound(code.H, restarts=25, seed=0)
    assert w <= 30
    H = np.asarray(code.H.todense(), np.int64)
    assert (H @ c.astype(np.int64) % 2 == 0).all()


def test_qc_subcode_bound_tiny(tiny_qc):
    """The restricted-subcode (QC-aware) search reaches the exact
    d_min on the anchored toy QC code and certifies a full-code word."""
    from tpu_ldpc.codes.dmin import dmin_upper_bound_qc

    w, c, st = dmin_upper_bound_qc(tiny_qc, max_info_cols=2, restarts=20,
                                   seed=0)
    assert w == 4
    H = np.asarray(tiny_qc.H.todense(), np.int64)
    assert (H @ c.astype(np.int64) % 2 == 0).all()
    assert c.sum() == 4
    assert st["subcodes"] >= 1


def test_impulse_bound_tiny(tiny_qc):
    """Decoder-impulse method finds the exact d_min on the short code
    (its measured reach; cross-checks the ISD search through an
    entirely independent mechanism)."""
    ub, st = estimate_dmin_impulse(tiny_qc)
    assert ub == 4
    assert st["converged_nonzero"] > 0
