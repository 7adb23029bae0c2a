"""Golden-model unit tests (SURVEY.md §4.1): pin the math itself.

The golden NumPy decoder is validated on tiny hand-checkable codes
against brute-force exact-ML decoding; everything else in the repo is
later validated against the golden model.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from tpu_ldpc.codes import LdpcCode, make_base_graph
from tpu_ldpc.golden import decode, encode, parity_map, syndrome_ok

# (7,4) Hamming code as an LDPC instance
H_HAMMING = np.array(
    [
        [1, 1, 0, 1, 1, 0, 0],
        [1, 0, 1, 1, 0, 1, 0],
        [0, 1, 1, 1, 0, 0, 1],
    ],
    dtype=np.uint8,
)


def all_codewords(H):
    """Enumerate all codewords of a small code by its null space basis."""
    H = np.asarray(H, dtype=np.uint8)
    m, n = H.shape
    from tpu_ldpc.golden import gf2_row_reduce

    rref, pivots = gf2_row_reduce(H)
    free = [c for c in range(n) if c not in pivots]
    words = []
    for bits in range(2 ** len(free)):
        c = np.zeros(n, dtype=np.uint8)
        for t, col in enumerate(free):
            c[col] = (bits >> t) & 1
        # back-solve pivots
        for r in range(len(pivots) - 1, -1, -1):
            c[pivots[r]] = np.dot(rref[r], c) % 2 ^ c[pivots[r]]
        words.append(c.copy())
    W = np.array(words)
    assert not (H @ W.T % 2).any()
    return W


def ml_decode(W, llr):
    """Exact ML over codeword list W for a batch of LLRs."""
    # ML codeword maximizes sum_i (1 - 2 c_i) * llr_i
    scores = (1.0 - 2.0 * W) @ llr.T  # (|C|, batch)
    return W[np.argmax(scores, axis=0)]


class TestHamming:
    def test_noiseless_zero_iters(self):
        W = all_codewords(H_HAMMING)
        llr = 8.0 * (1.0 - 2.0 * W.astype(np.float64))
        bits, ok, iters = decode(H_HAMMING, llr, algo="minsum", iters=20)
        assert ok.all()
        assert (iters == 0).all()
        assert (bits == W).all()

    @pytest.mark.parametrize("algo", ["minsum", "sumproduct"])
    def test_single_error_correction(self, algo):
        # d_min = 3: one weakly-wrong bit among strong correct bits.
        # (with a *strongly* wrong bit, min-sum on this tiny dense code can
        # legitimately converge to a different valid codeword — BP != ML)
        W = all_codewords(H_HAMMING)
        c = W[5]
        for pos in range(7):
            llr = 4.0 * (1.0 - 2.0 * c.astype(np.float64))
            llr[pos] = 2.0 * (2.0 * c[pos] - 1.0)
            bits, ok, iters = decode(H_HAMMING, llr[None], algo=algo, iters=30)
            assert ok[0], (pos, algo)
            assert (bits[0] == c).all(), (pos, algo)
            assert iters[0] >= 1

    @pytest.mark.parametrize("algo", ["sumproduct", "minsum"])
    def test_vs_exact_ml(self, algo):
        # statistically: BP can never beat ML on the same realizations,
        # and at this SNR it should agree with ML on the vast majority.
        rng = np.random.default_rng(42)
        W = all_codewords(H_HAMMING)
        idx = rng.integers(0, len(W), 400)
        c = W[idx]
        x = 1.0 - 2.0 * c.astype(np.float64)
        sigma = 0.6
        y = x + sigma * rng.normal(size=x.shape)
        llr = 2.0 * y / sigma**2
        ml = ml_decode(W, llr)
        bits, ok, _ = decode(H_HAMMING, llr, algo=algo, iters=50)
        ml_fer = (ml != c).any(axis=1).mean()
        bp_fer = (bits != c).any(axis=1).mean()
        # BP tracks ML closely on this tiny code.  (Strict bp_fer >= ml_fer
        # holds only in expectation — on a finite sample BP can output the
        # transmitted word where ML happens to pick another codeword.)
        agree = (bits == ml).all(axis=1).mean()
        assert agree >= 0.97
        assert abs(bp_fer - ml_fer) <= 0.03


class TestToyQC:
    """4x8 base, Z=4 -> (32, 16) toy QC code, exhaustive-adjacent checks."""

    @pytest.fixture(scope="class")
    def code(self):
        B = make_base_graph(4, 8, 4, seed=7)
        return LdpcCode.from_base_graph(B, 4, name="toy")

    def test_encode_golden(self, code):
        rng = np.random.default_rng(3)
        u = rng.integers(0, 2, (32, code.k))
        c = encode(code.H, u)
        assert syndrome_ok(code.H, c).all()
        # systematic
        assert (c[:, : code.k] == u).all()
        # linearity over GF(2)
        c2 = encode(code.H, u[::-1])
        assert (
            encode(code.H, (u ^ u[::-1])) == (c ^ c2)
        ).all()

    @pytest.mark.parametrize("schedule", ["flooding", "layered"])
    @pytest.mark.parametrize("algo", ["minsum", "sumproduct"])
    def test_waterfall_sane(self, code, algo, schedule):
        rng = np.random.default_rng(9)
        u = rng.integers(0, 2, (64, code.k))
        c = encode(code.H, u)
        x = 1.0 - 2.0 * c.astype(np.float64)
        ebn0 = 6.0
        sigma2 = 1.0 / (2 * code.rate * 10 ** (ebn0 / 10))
        y = x + np.sqrt(sigma2) * rng.normal(size=x.shape)
        llr = 2.0 * y / sigma2
        bits, ok, iters = decode(
            code.H, llr, algo=algo, schedule=schedule, iters=50
        )
        # at 6 dB on a (32,16) code nearly everything decodes
        assert ok.mean() > 0.9
        correct = (bits[:, : code.k] == u).all(axis=1)
        assert correct.mean() > 0.9
        # ok implies a valid codeword (syndrome zero)
        assert syndrome_ok(code.H, bits)[ok].all()

    def test_layered_converges_faster(self, code):
        rng = np.random.default_rng(10)
        u = rng.integers(0, 2, (64, code.k))
        c = encode(code.H, u)
        x = 1.0 - 2.0 * c.astype(np.float64)
        sigma2 = 1.0 / (2 * code.rate * 10 ** (5.0 / 10))
        llr = 2.0 * (x + np.sqrt(sigma2) * rng.normal(size=x.shape)) / sigma2
        _, ok_f, it_f = decode(code.H, llr, algo="minsum", schedule="flooding")
        _, ok_l, it_l = decode(code.H, llr, algo="minsum", schedule="layered")
        both = ok_f & ok_l
        assert it_l[both].mean() <= it_f[both].mean()


class TestEarlyStopSemantics:
    def test_iters_used_contract(self):
        # flipping no bits -> 0 iters; early_stop=False still returns ok
        W = all_codewords(H_HAMMING)
        llr = 5.0 * (1.0 - 2.0 * W[3].astype(np.float64))
        _, ok, iters = decode(H_HAMMING, llr[None], iters=10)
        assert ok[0] and iters[0] == 0
        bits, ok2, iters2 = decode(
            H_HAMMING, llr[None], iters=10, early_stop=False
        )
        assert ok2[0] and iters2[0] == 10
        assert (bits[0] == W[3]).all()

    def test_float32_matches_float64_decisions(self):
        rng = np.random.default_rng(11)
        W = all_codewords(H_HAMMING)
        c = W[rng.integers(0, len(W), 100)]
        x = 1.0 - 2.0 * c.astype(np.float64)
        y = x + 0.7 * rng.normal(size=x.shape)
        llr = 2.0 * y / 0.49
        b64, ok64, it64 = decode(H_HAMMING, llr, dtype=np.float64)
        b32, ok32, it32 = decode(
            H_HAMMING, llr.astype(np.float32), dtype=np.float32
        )
        # min-sum is numerically robust: decisions should agree
        assert (ok64 == ok32).mean() > 0.98
