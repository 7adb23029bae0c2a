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
    delivered: int        # frames decoded by the final stage
    avg_bits_sent: float  # mean transmitted bits per frame (per-lane HARQ)
    avg_info_rate: float  # k / avg_bits_sent

    @property
    def residual_fer(self) -> float:
        return 1.0 - self.delivered / self.frames


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
    u = rng.integers(0, 2, (batch, k)).astype(np.uint8)
    c = golden_encode(mother.H, u)            # one mother codeword/lane
    x = 1.0 - 2.0 * c.astype(np.float64)

    # Eb/N0 -> sigma referenced to the first transmission's tx rate
    r1 = k / ((kb + stage_m[0] - 2) * Z)
    sigma2 = noise_sigma2(ebn0_db, r1)
    llr_full = ((2.0 / sigma2) * (
        x + np.sqrt(sigma2) * rng.normal(size=x.shape))
    ).astype(np.float32)
    # the two high-degree systematic blocks are NEVER transmitted
    llr_full[:, : 2 * Z] = 0.0

    delivered_at = np.full(batch, -1, dtype=np.int64)  # stage index
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
        # count a lane delivered on its FIRST stage whose info decode
        # is correct (genie-free systems use ok/CRC; we record both)
        correct = (bits[:, :k] == u).all(axis=1)
        newly = correct & (delivered_at < 0)
        delivered_at[newly] = si
        n_tx_cum = n_m - 2 * Z
        stages.append({
            "m": m, "n_tx_cum": n_tx_cum,
            "rate_cum": k / n_tx_cum,
            "fer_after": float(1.0 - (delivered_at >= 0).mean()),
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
        avg_bits_sent=avg_bits, avg_info_rate=k / avg_bits,
    )
