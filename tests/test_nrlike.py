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
