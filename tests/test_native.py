"""Native C++ host kernels vs pure-NumPy references (SURVEY.md §2.3)."""

import numpy as np
import pytest

from tpu_ldpc import _native
from tpu_ldpc.codes import LdpcCode, make_base_graph
from tpu_ldpc.codes.base_graphs import _count_4cycles_py, _count_6cycles_py
from tpu_ldpc.golden import encoder as golden_enc

pytestmark = pytest.mark.skipif(
    _native.lib is None, reason="native library not built (no compiler?)"
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cycle_counts_match_python(seed):
    from tpu_ldpc.codes.base_graphs import _ace8_cost_py, _iter_8walks

    rng = np.random.default_rng(seed)
    B = make_base_graph(6, 12, 16, seed=seed).copy()
    # scramble some shifts to create cycles
    mask = B >= 0
    B[mask] = rng.integers(0, 16, mask.sum())
    assert _native.count_4cycles(B, 16) == _count_4cycles_py(B, 16)
    assert _native.count_6cycles(B, 16) == _count_6cycles_py(B, 16)
    assert _native.count_8cycles_raw(B, 16) == sum(
        1 for _ in _iter_8walks(B, 16)
    )
    assert abs(_native.ace8_cost(B, 16) - _ace8_cost_py(B, 16)) < 1e-9


def test_8cycles_exact_vs_brute_force_lifted_graph():
    """#lifted 8-cycles == Z * raw_tuples / 8 exactly, on tiny random QC
    codes, against brute-force simple-cycle enumeration in the lifted
    Tanner graph (validates the degenerate-pattern conditions:
    repeated base rows/cols, doubly-wrapped 4-cycles)."""
    from tpu_ldpc.codes.base_graphs import count_8cycles_raw
    from tpu_ldpc.codes.expand import expand

    def brute(H):
        H = np.asarray(H)
        m, _n = H.shape
        chk = [np.nonzero(H[i])[0] for i in range(m)]
        var = [np.nonzero(H[:, j])[0] for j in range(H.shape[1])]
        cnt = 0
        for c0 in range(m):
            for v1 in chk[c0]:
                for c1 in var[v1]:
                    if c1 == c0:
                        continue
                    for v2 in chk[c1]:
                        if v2 == v1:
                            continue
                        for c2 in var[v2]:
                            if c2 in (c0, c1):
                                continue
                            for v3 in chk[c2]:
                                if v3 in (v1, v2):
                                    continue
                                for c3 in var[v3]:
                                    if c3 in (c0, c1, c2):
                                        continue
                                    for v4 in chk[c3]:
                                        if v4 in (v1, v2, v3):
                                            continue
                                        if H[c0, v4]:
                                            cnt += 1
        return cnt // 8

    rng = np.random.default_rng(7)
    done = 0
    for _ in range(8):
        mb, nb = int(rng.integers(3, 5)), int(rng.integers(4, 6))
        Z = int(rng.integers(2, 5))
        B = np.where(rng.random((mb, nb)) < 0.7,
                     rng.integers(0, Z, (mb, nb)), -1)
        if (B >= 0).sum() < 6:
            continue
        H = expand(B, Z).toarray()
        assert 8 * brute(H) == Z * count_8cycles_raw(B, Z)
        done += 1
    assert done >= 5


def test_gf2_rank_matches_golden():
    rng = np.random.default_rng(3)
    M = rng.integers(0, 2, (40, 60)).astype(np.uint8)
    assert _native.gf2_rank(M) == golden_enc.gf2_rank(M)
    # rank-deficient case
    M[1] = M[0]
    M[2] = (M[0] + M[3]) % 2
    assert _native.gf2_rank(M) == golden_enc.gf2_rank(M)


def test_gf2_inv_matches_golden():
    rng = np.random.default_rng(4)
    while True:
        M = rng.integers(0, 2, (24, 24)).astype(np.uint8)
        if golden_enc.gf2_rank(M) == 24:
            break
    inv_n = _native.gf2_inv(M)
    inv_g = golden_enc.gf2_inv(M)
    assert (inv_n == inv_g).all()
    assert ((M.astype(int) @ inv_n) % 2 == np.eye(24)).all()


def test_gf2_inv_singular_raises():
    M = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError):
        _native.gf2_inv(M)


def test_parity_map_matches_golden():
    code = LdpcCode.from_base_graph(make_base_graph(6, 12, 8, seed=5), 8)
    H = np.asarray(code.H.todense(), dtype=np.uint8)
    Mn = _native.parity_map(H)
    Mg = golden_enc.parity_map(code.H)
    assert (Mn == Mg).all()


def test_code_parity_uses_native_consistently(judged_code):
    """LdpcCode.parity_M (native path) equals the golden computation."""
    Mg = golden_enc.parity_map(judged_code.H)
    assert (judged_code.parity_M == Mg).all()


def test_native_minsum_decoder_bitexact():
    """Native CPU decoder follows the golden contract exactly."""
    from tpu_ldpc.golden import decode as golden_decode, encode as golden_encode

    code = LdpcCode.from_base_graph(make_base_graph(4, 8, 8, seed=7), 8)
    rng = np.random.default_rng(6)
    u = rng.integers(0, 2, (48, code.k)).astype(np.uint8)
    c = golden_encode(code.H, u)
    x = 1.0 - 2.0 * c
    s2 = 1 / (2 * code.rate * 10 ** 0.25)
    llr = ((2 / s2) * (x + np.sqrt(s2) * rng.normal(size=x.shape))
           ).astype(np.float32)
    for alpha, beta in [(0.75, 0.0), (1.0, 0.2)]:
        gb, gok, git = golden_decode(
            code.H, llr, algo="minsum", iters=20, alpha=alpha, beta=beta,
            dtype=np.float32,
        )
        nb_, nok, nit = _native.minsum_decode(
            code.H, llr, iters=20, alpha=alpha, beta=beta
        )
        assert (gb == nb_).all()
        assert (gok == nok).all()
        assert (git == nit).all()
    # no-early-stop path
    gb, gok, _ = golden_decode(
        code.H, llr, algo="minsum", iters=20, dtype=np.float32,
        early_stop=False,
    )
    nb_, nok, _ = _native.minsum_decode(code.H, llr, iters=20,
                                        early_stop=False)
    assert (gb == nb_).all()
    assert (gok == nok).all()


def test_native_minsum_graph_cache_not_poisoned_by_id_reuse():
    """Regression: the graph cache was keyed by bare id(H); once an H was
    garbage-collected, a *different* matrix allocated at the recycled id
    silently decoded against the stale graph.  The cache entry must pin
    its H.  Build many short-lived codes in a loop (forcing id reuse) and
    check each decode against the golden model."""
    from tpu_ldpc.golden import decode as golden_decode

    rng = np.random.default_rng(3)
    for seed in range(6):
        code = LdpcCode.from_base_graph(
            make_base_graph(4, 8, 8, seed=seed), 8, name=f"c{seed}"
        )
        llr = rng.normal(scale=4.0, size=(16, code.n)).astype(np.float32)
        gb, gok, git = golden_decode(
            code.H, llr, algo="minsum", iters=10, dtype=np.float32
        )
        nb_, nok, nit = _native.minsum_decode(code.H, llr, iters=10)
        assert (gb == nb_).all() and (gok == nok).all() and (git == nit).all()
        del code  # drop the only strong ref outside the cache
