"""Code-construction tests (SURVEY.md §4.3 algebraic invariants)."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpu_ldpc.codes import (
    FAMILY_LIFTS,
    LdpcCode,
    count_4cycles,
    expand,
    make_base_graph,
    rotate,
)
from tpu_ldpc.golden import gf2_rank

ALL_RATES = ["1/2", "2/3", "3/4", "5/6"]
FAMILY_CELLS = [
    (fam, rate, Z)
    for fam in FAMILY_LIFTS
    for rate in ALL_RATES
    for Z in FAMILY_LIFTS[fam]
]


class TestExpand:
    def test_circulant_convention(self):
        # single block with shift s: H[r, (r+s)%Z] == 1
        Z, s = 8, 3
        B = np.array([[s]])
        H = np.asarray(expand(B, Z).todense())
        for r in range(Z):
            assert H[r, (r + s) % Z] == 1
        assert H.sum() == Z
        # operator form: (P^s v)[r] = v[(r+s)%Z] = rotate(v, s)
        v = np.arange(Z)
        assert (H @ v == rotate(v, s)).all()

    def test_zero_block(self):
        B = np.array([[-1, 2], [0, -1]])
        H = np.asarray(expand(B, 4).todense())
        assert H[:4, :4].sum() == 0
        assert H[4:, 4:].sum() == 0
        assert H[:4, 4:].sum() == 4
        assert H[4:, :4].sum() == 4

    def test_decompile_roundtrip(self, judged_code):
        """Read each Z x Z block of H back into a base entry."""
        code = judged_code
        H = np.asarray(code.H.todense())
        Z = code.Z
        for i in range(code.mb):
            for j in range(code.nb):
                blk = H[i * Z : (i + 1) * Z, j * Z : (j + 1) * Z]
                if code.B[i, j] < 0:
                    assert blk.sum() == 0
                else:
                    s = code.B[i, j]
                    expect = np.zeros((Z, Z), dtype=np.uint8)
                    expect[np.arange(Z), (np.arange(Z) + s) % Z] = 1
                    assert (blk == expect).all()


class TestJudgedCode:
    def test_shape(self, judged_code):
        assert (judged_code.n, judged_code.k) == (1024, 512)
        assert judged_code.rate == 0.5

    def test_full_rank(self, judged_code):
        H = np.asarray(judged_code.H.todense())
        assert gf2_rank(H) == judged_code.m

    def test_girth_at_least_8(self, judged_code):
        assert judged_code.girth_lower_bound() >= 8

    def test_deterministic(self):
        a, b = LdpcCode.judged(), LdpcCode.judged()
        assert np.array_equal(a.B, b.B)


class TestFamilies:
    @pytest.mark.parametrize("fam,rate,Z", FAMILY_CELLS)
    def test_structure(self, fam, rate, Z):
        code = LdpcCode.from_family(fam, rate, Z)
        num, den = map(int, rate.split("/"))
        assert code.k * den == code.n * num
        # 4-cycle free (girth >= 6) in every family cell
        assert count_4cycles(code.B, code.Z) == 0
        # dual-diagonal parity part is present (shift-0 double diagonal)
        kb = code.nb - code.mb
        for t in range(1, code.mb):
            assert code.B[t - 1, kb + t] == 0
            assert code.B[t, kb + t] == 0

    @pytest.mark.parametrize("fam,rate,Z", [("wifi", "1/2", 27), ("wimax", "5/6", 24)])
    def test_full_rank_representative(self, fam, rate, Z):
        code = LdpcCode.from_family(fam, rate, Z)
        assert gf2_rank(np.asarray(code.H.todense())) == code.m

    def test_determinism_across_cache(self):
        a = LdpcCode.from_family("wifi", "1/2", 27)
        b = LdpcCode.from_family("wifi", "1/2", 27)
        assert np.array_equal(a.B, b.B)


class TestMakeBaseGraph:
    def test_rejects_bad_shape(self):
        with pytest.raises(ValueError):
            make_base_graph(8, 8, 16)

    def test_mask_structure(self):
        B = make_base_graph(6, 12, 32, seed=1)
        kb = 6
        # closing column weight 3 with (1, 0, 1)
        col = B[:, kb]
        nz = np.nonzero(col >= 0)[0]
        assert list(nz) == [0, 3, 5]
        assert col[0] == 1 and col[3] == 0 and col[5] == 1


def test_6cycle_count_exact_on_k33():
    """Regression: the enumeration constrained only i1 < i2 hit each
    cycle three times (halved -> 1.5x overcount).  K3,3 (all-ones 3x3
    base at Z=1) has exactly six 6-cycles; the ACE cost with all column
    degrees 3 weights each by 2^-3."""
    from tpu_ldpc.codes.base_graphs import (
        _ace6_cost_py, _count_6cycles_py, ace6_cost, count_6cycles,
    )

    B = np.zeros((3, 3), dtype=np.int64)
    assert count_6cycles(B, 1) == 6
    assert _count_6cycles_py(B, 1) == 6
    assert ace6_cost(B, 1) == 0.75
    assert _ace6_cost_py(B, 1) == 0.75


class TestPeg:
    """QC-PEG greedy shift assignment (codes/peg.py; VERDICT r2 #10)."""

    def test_support_preserved_and_cyclefree(self):
        import numpy as np

        from tpu_ldpc.codes.base_graphs import (
            count_4cycles,
            family_base_graph,
        )
        from tpu_ldpc.codes.peg import peg_assign_shifts

        B = np.asarray(family_base_graph("wimax", "1/2", 24))
        Bp = peg_assign_shifts(B, 24, seed=1)
        assert ((Bp >= 0) == (B >= 0)).all()
        # parity part frozen verbatim
        mb, nb = B.shape
        assert np.array_equal(Bp[:, nb - mb:], B[:, nb - mb:])
        assert count_4cycles(Bp, 24) == 0

    def test_bfs_distances_match_bruteforce(self):
        """Lifted BFS distances agree with networkx-free brute-force BFS
        on a tiny lifted graph."""
        import numpy as np

        from tpu_ldpc.codes.expand import expand
        from tpu_ldpc.codes.peg import _bfs_check_dists

        rng = np.random.default_rng(0)
        Z, mb, nb = 4, 3, 6
        B = np.where(rng.random((mb, nb)) < 0.7,
                     rng.integers(0, Z, (mb, nb)), -1)
        H = np.asarray(expand(B, Z).todense() if hasattr(
            expand(B, Z), "todense") else expand(B, Z))
        m, n = H.shape
        # brute-force BFS from variable j0*Z+0 over the bipartite graph
        j0 = 0
        INF = 10**9
        dv = np.full(n, INF)
        dcheck = np.full(m, INF)
        dv[j0 * Z + 0] = 0
        for _ in range(m + n):
            for r in range(m):
                cols = np.flatnonzero(H[r])
                if len(cols):
                    dcheck[r] = min(dcheck[r], dv[cols].min() + 1)
            for c in range(n):
                rows = np.flatnonzero(H[:, c])
                if len(rows):
                    dv[c] = min(dv[c], dcheck[rows].min() + 1)
        dc, _ = _bfs_check_dists(B, Z, j0)
        # expand() convention may differ from peg's lifted convention by
        # a per-block relabeling of check copies — compare the sorted
        # per-block distance multisets, which any relabeling preserves
        for i in range(mb):
            got = sorted(int(x) for x in dc[i])
            want = sorted(
                -1 if d >= INF else int(d)
                for d in dcheck[i * Z:(i + 1) * Z]
            )
            assert got == want, (i, got, want)

    def test_peg_girth_on_fresh_support(self):
        """On a sparse random support at a generous lift, PEG alone
        reaches girth >= 8 (no 4-cycles, usually no 6-cycles)."""
        import numpy as np

        from tpu_ldpc.codes.base_graphs import (
            count_4cycles,
            count_6cycles,
            make_base_graph,
        )
        from tpu_ldpc.codes.peg import peg_assign_shifts

        B0 = np.asarray(make_base_graph(4, 8, 32, seed=5))
        Bp = peg_assign_shifts(B0, 32, seed=2)
        assert count_4cycles(Bp, 32) == 0
        assert count_6cycles(Bp, 32) <= count_6cycles(B0, 32)
