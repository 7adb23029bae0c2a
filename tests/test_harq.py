"""IR-HARQ over the NR-like nested family (sim/harq.py)."""

import numpy as np
import pytest

from tpu_ldpc.codes.nrlike import KB, M_MOTHER, make_nrlike_base_graph
from tpu_ldpc.sim.harq import run_irharq

Z = 16


def test_mother_codeword_prefix_is_codeword_of_every_truncation():
    """The nesting property IR-HARQ relies on: the first (kb+m) blocks
    of a mother codeword satisfy the m-row truncation's H."""
    from tpu_ldpc.codes.code import LdpcCode
    from tpu_ldpc.golden import encode as golden_encode

    mother = LdpcCode("m", make_nrlike_base_graph(Z, m=M_MOTHER), Z)
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, (4, mother.k)).astype(np.uint8)
    c = golden_encode(mother.H, u)
    for m in (4, 7, 13, 24):
        code_m = LdpcCode("t", make_nrlike_base_graph(Z, m=m), Z)
        n_m = (KB + m) * Z
        syn = (np.asarray(code_m.H.todense()) @ c[:, :n_m].T) % 2
        assert not syn.any(), m


def test_irharq_stages_monotone():
    """At an SNR where the first (high-rate) stage often fails,
    increments must strictly help: FER non-increasing over stages,
    effective info rate between final-stage and first-stage rates."""
    res = run_irharq(Z=Z, stage_m=(7, 13, 24), ebn0_db=1.0, batch=96,
                     iters=30, seed=1)
    fers = [s["fer_after"] for s in res.stages]
    assert all(a >= b for a, b in zip(fers, fers[1:]))
    assert fers[0] > fers[-1]  # increments actually delivered frames
    assert res.delivered > 0
    r_first = res.stages[0]["rate_cum"]
    r_last = res.stages[-1]["rate_cum"]
    assert r_last <= res.avg_info_rate <= r_first
    # bits-on-air accounting: between first-stage-only and all-stages
    assert res.stages[0]["n_tx_cum"] <= res.avg_bits_sent
    assert res.avg_bits_sent <= res.stages[-1]["n_tx_cum"]


def test_irharq_easy_snr_single_transmission():
    """At generous SNR every lane delivers on the first transmission —
    the protocol costs nothing beyond the high-rate stage."""
    res = run_irharq(Z=Z, stage_m=(7, 24), ebn0_db=6.0, batch=64,
                     iters=30, seed=2)
    assert res.residual_fer == 0.0
    assert res.avg_bits_sent == res.stages[0]["n_tx_cum"]
    assert res.avg_info_rate == pytest.approx(res.stages[0]["rate_cum"])


def test_irharq_bg2_deep_extension():
    """BG2 IR-HARQ spans rate 2/3 down to 1/5: at an SNR hopeless for
    the first transmission, deep increments still deliver frames."""
    res = run_irharq(Z=Z, stage_m=(7, 17, 42), ebn0_db=0.5, batch=64,
                     iters=40, seed=4, bg=2)
    fers = [s["fer_after"] for s in res.stages]
    assert all(a >= b for a, b in zip(fers, fers[1:]))
    assert fers[-1] < fers[0]
    # rate_cum counts PAYLOAD bits (default crc24 is overhead)
    assert res.stages[-1]["rate_cum"] == pytest.approx(
        res.k_payload / (50 * Z))
    assert res.k_payload == 10 * Z - 24


def test_irharq_crc_vs_genie_termination():
    """CRC-gated delivery must agree with the genie wherever no false
    ACK occurred (the CRC can only differ by false-ACKing), and the
    genie cross-check column must account for every false ACK."""
    crc_res = run_irharq(Z=Z, stage_m=(7, 13, 24), ebn0_db=1.0,
                         batch=96, iters=30, seed=1)
    genie = run_irharq(Z=Z, stage_m=(7, 13, 24), ebn0_db=1.0,
                       batch=96, iters=30, seed=1, crc=None)
    assert crc_res.crc == "crc24"
    assert genie.crc is None and genie.false_acks == 0
    assert crc_res.k_payload == genie.k_payload - 24
    for s in crc_res.stages:
        # genie column counts false ACKs as NOT delivered
        assert s["fer_after_genie"] >= s["fer_after"]
    assert 0 <= crc_res.false_ack_rate <= 1
    # crc24 on a ~300-bit payload: a false ACK in 96 lanes would be
    # astronomically unlucky — delivery should match the genie run's
    # (same noise realization: identical payload RNG consumption
    # differs, so compare rates loosely)
    assert abs(crc_res.residual_fer - genie.residual_fer) < 0.25


def test_irharq_crc_false_ack_detection_semantics():
    """A wrong decode that the CRC catches keeps the lane
    retransmitting: at hopeless SNR with crc, no lane may be marked
    delivered-with-wrong-payload unless false_acks says so."""
    res = run_irharq(Z=Z, stage_m=(7,), ebn0_db=-2.0, batch=64,
                     iters=10, seed=3)
    # fer_after_genie - fer_after == false_ack fraction, exactly
    s = res.stages[-1]
    assert s["fer_after_genie"] - s["fer_after"] == pytest.approx(
        res.false_acks / res.frames)
