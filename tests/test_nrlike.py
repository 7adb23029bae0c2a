"""NR-like rate-compatible family (codes/nrlike.py; SURVEY.md C1
"...-like codes", VERDICT r3 #9).

Contracts: nested truncation, girth/rank structure, the built-in
two-block puncturing path through channel/adapt + the MC harness, and
a decode smoke at an easy operating point.
"""

import numpy as np
import pytest

from tpu_ldpc.codes.base_graphs import count_4cycles, girth_lower_bound
from tpu_ldpc.codes.nrlike import (
    KB,
    M_BY_RATE,
    M_MOTHER,
    make_nrlike_base_graph,
    nrlike_adapt,
    nrlike_code,
    tx_rate,
)

Z = 16  # small lift: fast tests; construction is Z-generic


def test_nested_truncation():
    """Every rate point is a row/column prefix of the mother graph —
    the NR-style incremental-redundancy property."""
    mother = make_nrlike_base_graph(Z, m=M_MOTHER)
    for rate, m in M_BY_RATE.items():
        B = make_nrlike_base_graph(Z, m=m)
        assert B.shape == (m, KB + m)
        assert np.array_equal(B, mother[:m, : KB + m])


def test_structure_invariants():
    """4-cycle-free at every rate point (truncation can only remove
    cycles); extension rows carry degree-1 parity; first two info
    columns are high-degree (the punctured pair)."""
    for rate, m in M_BY_RATE.items():
        B = make_nrlike_base_graph(Z, m=m)
        assert count_4cycles(B, Z) == 0
        assert girth_lower_bound(B, Z) >= 6
        for i in range(4, m):
            col = B[:, KB + i]
            assert (col >= 0).sum() == 1 and col[i] == 0
        deg01 = [(B[:, j] >= 0).sum() for j in (0, 1)]
        regular = [(B[:, j] >= 0).sum() for j in range(2, KB)]
        assert min(deg01) > max(regular) or m == 4


def test_full_rank_and_tx_rates():
    from tpu_ldpc.codes.dmin import gf2_nullspace_basis

    for rate, m in M_BY_RATE.items():
        code = nrlike_code(rate, Z)
        assert gf2_nullspace_basis(code.H).shape[0] == code.k
        expect = KB / (KB + m - 2)
        assert tx_rate(code) == pytest.approx(expect)
    assert tx_rate(nrlike_code("1/2", Z)) == pytest.approx(0.5)
    assert tx_rate(nrlike_code("2/3", Z)) == pytest.approx(2 / 3)


def test_adapt_masks():
    """nrlike_adapt punctures exactly the first two block-columns."""
    code = nrlike_code("2/3", Z)
    adapt = nrlike_adapt(code)
    tx_mask, known_llr, active_u = adapt.masks(code.n, code.k)
    assert (tx_mask[: 2 * Z] == 0).all()
    assert (tx_mask[2 * Z:] == 1).all()
    assert (known_llr == 0).all() and (active_u == 1).all()


def test_decode_with_puncturing():
    """End-to-end MC through the harness: at an easy SNR the punctured
    systematic blocks are recovered and FER is (near) zero."""
    from tpu_ldpc.sim.mc import DecodeCfg, run_ber

    code = nrlike_code("1/2", Z)
    cfg = DecodeCfg(algo="minsum", iters=50, impl="jnp")
    r = run_ber(code, [3.5], cfg=cfg, target_frame_errors=8,
                max_frames=256, batch=64, adapt=nrlike_adapt(code))[0]
    assert r.frames >= 256 or r.frame_errors >= 8
    assert r.fer < 0.05, (r.fer, r.frames)


def test_cli_config_builds_nr_with_default_puncture():
    """CodeSpec(family='nr') builds the cell and ChannelCfg defaults
    the family's puncture contract in."""
    from tpu_ldpc.cli.config import ChannelCfg, CodeSpec

    code = CodeSpec(family="nr", rate="3/4", Z=Z).build()
    assert code.name == f"nr1_r34_z{Z}"
    adapt = ChannelCfg().build_adapt(code)
    assert adapt is not None
    assert len(adapt.puncture) == 2 * Z
    # explicit adaptation still wins
    adapt2 = ChannelCfg(puncture_blocks=(KB,)).build_adapt(code)
    assert len(adapt2.puncture) == Z


class TestBG2:
    """BG2-like low-rate cells (kb=10, rates down to 1/5) — the
    registry's only coverage below rate 1/2."""

    def test_structure_and_nesting(self):
        from tpu_ldpc.codes.nrlike import KB2, M_BY_RATE2, M_MOTHER2

        mother = make_nrlike_base_graph(Z, m=M_MOTHER2, kb=KB2)
        for rate, m in M_BY_RATE2.items():
            B = make_nrlike_base_graph(Z, m=m, kb=KB2)
            assert np.array_equal(B, mother[:m, : KB2 + m])
            assert count_4cycles(B, Z) == 0
            for i in range(4, m):
                assert B[i, KB2 + i] == 0  # degree-1 extension parity
        # measured-essential BG2 shape: sparse punctured coverage and
        # tapered extension degree (module docstring, r4 A/B)
        punct_deg = (mother[:, 0] >= 0).sum() + (mother[:, 1] >= 0).sum()
        assert punct_deg <= M_MOTHER2 // 2 + 8
        deep_deg = [(mother[i, 2:KB2] >= 0).sum() for i in range(16, 42)]
        assert max(deep_deg) == 2

    def test_full_rank_and_rates(self):
        from tpu_ldpc.codes.dmin import gf2_nullspace_basis
        from tpu_ldpc.codes.nrlike import KB2, M_BY_RATE2

        for rate, m in M_BY_RATE2.items():
            code = nrlike_code(rate, Z, bg=2)
            assert code.name == f"nr2_r{rate.replace('/', '')}_z{Z}"
            assert gf2_nullspace_basis(code.H).shape[0] == code.k
            assert tx_rate(code) == pytest.approx(KB2 / (KB2 + m - 2))

    def test_low_rate_decodes_with_minsum(self):
        """The regression the BG2 shape exists to prevent: NORMALIZED
        MIN-SUM (not just SP) decodes the rate-1/5 mother at a
        moderate SNR.  The dense/uniform BG1 recipe measured FER 1.0
        here while SP decoded — a min-sum-specific structural
        failure."""
        from tpu_ldpc.sim.mc import DecodeCfg, run_ber

        code = nrlike_code("1/5", Z, bg=2)
        cfg = DecodeCfg(algo="minsum", iters=50, impl="jnp")
        r = run_ber(code, [2.5], cfg=cfg, target_frame_errors=8,
                    max_frames=256, batch=64,
                    adapt=nrlike_adapt(code))[0]
        assert r.fer < 0.1, (r.fer, r.mean_iters)
        assert r.mean_iters < 40

    def test_cli_builds_nr2(self):
        from tpu_ldpc.cli.config import ChannelCfg, CodeSpec

        code = CodeSpec(family="nr2", rate="2/5", Z=Z).build()
        assert code.name == f"nr2_r25_z{Z}"
        adapt = ChannelCfg().build_adapt(code)
        assert adapt is not None and len(adapt.puncture) == 2 * Z


def test_z32_second_lift_registry_cells():
    """r5 (VERDICT r4 #9): the NR construction generalizes across Z —
    the z32 ladder builds 4-cycle-free at every rate point on both
    base graphs, with the right dimensions, and the easy-SNR decode
    smoke passes through the standard punctured channel."""
    from tpu_ldpc.channel import noise_sigma2
    from tpu_ldpc.golden import encode as golden_encode
    from tpu_ldpc.decode.api import build_decode_fn
    from tpu_ldpc.sim.mc import DecodeCfg

    for bg, rates, kb in ((1, ("1/2", "5/6"), 22), (2, ("1/5", "2/3"), 10)):
        for rate in rates:
            code = nrlike_code(rate, 32, bg=bg)
            assert code.name == f"nr{bg}_r{rate.replace('/', '')}_z32"
            assert code.k == kb * 32
            assert count_4cycles(code.B, 32) == 0
    # decode smoke on one cell per graph at a generous punctured point
    rng = np.random.default_rng(7)
    for bg, rate, ebn0 in ((1, "1/2", 5.0), (2, "2/3", 7.0)):
        code = nrlike_code(rate, 32, bg=bg)
        u = rng.integers(0, 2, (8, code.k)).astype(np.uint8)
        c = golden_encode(code.H, u)
        x = 1.0 - 2.0 * c.astype(np.float64)
        s2 = noise_sigma2(ebn0, code.k / (code.n - 64))
        llr = ((2.0 / s2) * (x + np.sqrt(s2) * rng.normal(size=x.shape))
               ).astype(np.float32)
        llr[:, :64] = 0.0
        bits, ok, _ = build_decode_fn(
            code, DecodeCfg(impl="jnp", iters=30))(llr)
        assert (np.asarray(bits)[:, : code.k] == u).all()
