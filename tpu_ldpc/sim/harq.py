"""Incremental-redundancy HARQ simulation over the NR-like
rate-compatible family (SURVEY.md C5/C10 extension; codes/nrlike.py).

This is what the nested mother-graph structure is FOR: encode ONCE at
the lowest rate (the full mother), transmit a high-rate prefix, and on
decode failure send additional parity block-columns — each
retransmission only reveals more of the same mother codeword, so the
receiver re-decodes a longer truncation with accumulated LLRs (chase
combining is unnecessary: the increments are new positions, not
repeats).

Nesting makes this sound: extension parities depend only on earlier
columns, so the first (kb + m) block-columns of a mother codeword form
a valid codeword of the m-row truncation for every m (asserted in
tests/test_harq.py).

Vectorized semantics: every stage decodes the full batch (XLA static
shapes — per-lane early exit would be a dynamic shape), but a lane's
DELIVERED stage is its first success; `bits_sent` counts, per lane,
only the increments up to that stage (+ all stages for never-delivered
lanes), which is exactly the air-interface cost of per-lane HARQ.

Termination (VERDICT r4 #1): delivery is gated by an outer CRC
(codes/crc.py) by default — a lane ACKs at its first stage whose
decoded info block passes the CRC, exactly like a real receiver, and
a CRC pass on a wrong payload is a FALSE ACK (the lane stops
retransmitting with corrupt data; counted in `false_acks`).  The old
genie comparison (decoded == transmitted) is kept as cross-check
columns (`fer_after_genie`), and `crc=None` restores pure genie
termination.  The CRC bits cost rate: `avg_info_rate` counts PAYLOAD
bits (k - crc_width) per transmitted bit when a CRC is attached.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from tpu_ldpc.codes.nrlike import (
    KB,
    KB2,
    M_MOTHER,
    M_MOTHER2,
    make_nrlike_base_graph,
)


@dataclasses.dataclass
class HarqResult:
    ebn0_db: float
    stages: list          # per stage: dict(m, n_tx_cum, fer_after, ...)
    frames: int
    delivered: int        # frames ACKed (CRC pass; genie if crc=None)
    avg_bits_sent: float  # mean transmitted bits per frame (per-lane HARQ)
    avg_info_rate: float  # payload bits / avg_bits_sent
    crc: str | None = None      # CRC gating delivery (None = genie)
    k_payload: int = 0          # info bits per frame excl. CRC
    false_acks: int = 0         # CRC passed on a WRONG payload (lane
    #                             stopped with corrupt data)

    @property
    def residual_fer(self) -> float:
        return 1.0 - self.delivered / self.frames

    @property
    def false_ack_rate(self) -> float:
        """P(undetected error | ACK) — the rate the CRC width governs."""
        return self.false_acks / max(self.delivered, 1)


def run_irharq(
    Z: int = 64,
    stage_m: Sequence[int] = (7, 10, 13, 24),
    ebn0_db: float = 3.0,
    batch: int = 256,
    iters: int = 50,
    algo: str = "minsum",
    alpha: float = 0.75,
    seed: int = 0,
    impl: str = "jnp",
    bg: int = 1,
    crc: str | None = "crc24",
) -> HarqResult:
    """Simulate per-lane IR-HARQ: first transmission at stage_m[0]'s
    rate, one parity increment per later stage.

    The mother codeword is encoded once (pivot encoder on the full
    mother H); noise is drawn once for every position and revealed
    stage by stage — exactly the physics of retransmitting increments
    over independent channel uses.  Eb/N0 references the FIRST
    transmission's rate (the operating rate of the link; later
    increments are the protocol's overhead, which `avg_bits_sent`
    accounts).
    """
    import jax

    from tpu_ldpc.channel import noise_sigma2
    from tpu_ldpc.codes.code import LdpcCode
    from tpu_ldpc.decode.api import build_decode_fn
    from tpu_ldpc.golden import encode as golden_encode
    from tpu_ldpc.sim.mc import DecodeCfg

    kb = KB if bg == 1 else KB2
    m_mother = M_MOTHER if bg == 1 else M_MOTHER2
    stage_m = sorted(set(int(m) for m in stage_m))
    if stage_m[0] < 4 or stage_m[-1] > m_mother:
        raise ValueError(f"stage_m must lie in [4, {m_mother}]")
    mother = LdpcCode(f"nr{bg}_m{m_mother}_z{Z}",
                      make_nrlike_base_graph(Z, m=m_mother, kb=kb), Z)
    k = mother.k
    rng = np.random.default_rng(seed)
    if crc is not None:
        from tpu_ldpc.codes.crc import attach, check, get_spec

        spec = get_spec(crc)
        kp = k - spec.width
        if kp <= 0:
            raise ValueError(f"{spec.name} width >= info length {k}")
        u = attach(rng.integers(0, 2, (batch, kp)).astype(np.uint8),
                   spec)                      # [payload | crc(payload)]
    else:
        kp = k
        u = rng.integers(0, 2, (batch, k)).astype(np.uint8)
    c = golden_encode(mother.H, u)            # one mother codeword/lane
    x = 1.0 - 2.0 * c.astype(np.float64)

    # Eb/N0 -> sigma referenced to the first transmission's TRUE info
    # rate (payload bits per transmitted bit — the CRC is overhead)
    r1 = kp / ((kb + stage_m[0] - 2) * Z)
    sigma2 = noise_sigma2(ebn0_db, r1)
    llr_full = ((2.0 / sigma2) * (
        x + np.sqrt(sigma2) * rng.normal(size=x.shape))
    ).astype(np.float32)
    # the two high-degree systematic blocks are NEVER transmitted
    llr_full[:, : 2 * Z] = 0.0

    delivered_at = np.full(batch, -1, dtype=np.int64)  # stage index
    false_ack = np.zeros(batch, dtype=bool)   # ACKed with wrong payload
    stages = []
    for si, m in enumerate(stage_m):
        n_m = (kb + m) * Z
        code_m = LdpcCode(f"nr{bg}_m{m}_z{Z}",
                          make_nrlike_base_graph(Z, m=m, kb=kb), Z)
        # accumulated observations: all transmitted positions so far;
        # positions of THIS truncation not yet sent (none, by
        # construction) and the punctured pair stay erased (LLR 0)
        llr_m = llr_full[:, :n_m]
        cfg = DecodeCfg(algo=algo, iters=iters, alpha=alpha, impl=impl)
        bits, ok, _ = map(np.asarray,
                          jax.device_get(build_decode_fn(code_m, cfg)(
                              llr_m)))
        # a lane ACKs at its FIRST stage whose decoded info block
        # passes the CRC (receiver-side, no genie); the genie verdict
        # (payload exactly right) is kept as a cross-check column
        correct = (bits[:, :kp] == u[:, :kp]).all(axis=1)
        if crc is not None:
            acked = check(bits[:, :k], spec)
        else:
            acked = correct
        newly = acked & (delivered_at < 0)
        delivered_at[newly] = si
        false_ack[newly & ~correct] = True
        n_tx_cum = n_m - 2 * Z
        stages.append({
            "m": m, "n_tx_cum": n_tx_cum,
            "rate_cum": kp / n_tx_cum,
            "fer_after": float(1.0 - (delivered_at >= 0).mean()),
            "fer_after_genie": float(
                1.0 - ((delivered_at >= 0) & ~false_ack).mean()),
            "ok_frac": float(np.asarray(ok).mean()),
        })
    # per-lane bits on air: increments up to the delivering stage
    # (never-delivered lanes paid for every stage)
    tx_bits_at = np.asarray([s["n_tx_cum"] for s in stages])
    per_lane = np.where(delivered_at >= 0,
                        tx_bits_at[np.maximum(delivered_at, 0)],
                        tx_bits_at[-1])
    avg_bits = float(per_lane.mean())
    return HarqResult(
        ebn0_db=ebn0_db, stages=stages, frames=batch,
        delivered=int((delivered_at >= 0).sum()),
        avg_bits_sent=avg_bits, avg_info_rate=kp / avg_bits,
        crc=None if crc is None else spec.name,
        k_payload=kp, false_acks=int(false_ack.sum()),
    )
