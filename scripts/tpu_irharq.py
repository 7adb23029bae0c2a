"""IR-HARQ operating curves + system throughput on hardware
(sim/harq.py over the NR-like z64 mothers; VERDICT r4 #1/#6).

Per Eb/N0 point and ladder (BG1 kb=22, BG2 kb=10):
  * stage FERs under CRC-24-gated delivery (the receiver's real ACK
    rule), genie cross-check column, false-ACK counts;
  * per-stage decode cost measured with the traced-op-point LoopTimer
    (one compile per stage serves every Eb/N0) at the stage's TRUE
    channel: sigma from the first transmission's payload rate, the
    2Z punctured positions erased;
  * effective decoded info throughput: with per-lane active-set
    batching (a deployment decodes only still-NACKed lanes, so stage s
    costs occupancy p_s x t_s) and the full-vector lower bound (every
    stage decodes everything — what sim/harq.py itself does).

Every stage is timed (compiles are cached per stage via the traced
operating point, so extra points are cheap): the full-vector bound
needs EVERY stage's cost by definition; the active-batching metric
weights by occupancy.

Writes artifacts/nr1_irharq.json (atomic).  One TPU process at a time.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "nr1_irharq.json")

BATCH = 4096
ITERS = 50
MIN_OCC = 5e-4
# ladder -> (stage_m, points, stage cell rates for knob/metadata refs)
LADDERS = {
    1: {"stage_m": (7, 10, 13, 24), "points": (2.0, 3.0, 4.0),
        "rates": ("5/6", "3/4", "2/3", "1/2")},
    2: {"stage_m": (7, 12, 17, 27, 42), "points": (0.5, 1.5, 3.0),
        "rates": ("2/3", "1/2", "2/5", "2/7", "1/5")},
}


def main():
    import jax

    from tpu_ldpc.benchcore import make_timer
    from tpu_ldpc.channel import noise_sigma2
    from tpu_ldpc.codes.nrlike import KB, KB2, make_nrlike_base_graph
    from tpu_ldpc.codes.code import LdpcCode
    from tpu_ldpc.decode.pallas_bp import build_pallas_decoder
    from tpu_ldpc.sim.harq import run_irharq

    assert jax.default_backend() == "tpu", jax.default_backend()

    res = {"date": time.strftime("%Y-%m-%d %H:%M"), "Z": 64,
           "batch": BATCH, "impl": "auto", "crc": "crc24",
           "ladders": {}}

    for bg, spec in LADDERS.items():
        kb = KB if bg == 1 else KB2
        stage_m = spec["stage_m"]
        # per-stage truncation codes + fused ET decoders (timers built
        # lazily; ONE timer per stage reused across Eb/N0 via
        # measure_at's traced operating point)
        stage_codes = [
            LdpcCode(f"nr{bg}_m{m}_z64",
                     make_nrlike_base_graph(64, m=m, kb=kb), 64)
            for m in stage_m]
        stage_dec = {}
        stage_timer = {}

        def stage_cost_s(si, ebn0, *, _codes=stage_codes, _bg=bg,
                         _stage_m=stage_m, _kb=kb, _dec=stage_dec,
                         _tim=stage_timer):
            """Measured decode seconds/frame for stage si at the HARQ
            channel of this Eb/N0 (sigma referenced to the FIRST
            transmission's payload rate, punctured pair erased)."""
            code_m = _codes[si]
            if si not in _dec:
                _dec[si] = build_pallas_decoder(
                    code_m, algo="minsum", iters=ITERS, alpha=0.75,
                    early_stop=True)
                # mask: first 2Z punctured; rate arg is ignored for
                # sigma here (explicit scale/sig at measure_at)
                _tim[si], _ = make_timer(code_m, BATCH, ebn0_db=2.0,
                                         inner=30, n_punct=128)
            kp = _kb * 64 - 24
            r1 = kp / ((_kb + _stage_m[0] - 2) * 64)
            sigma2 = noise_sigma2(ebn0, r1)
            m = _tim[si].measure_at(_dec[si], scale=2.0 / sigma2,
                                    sig=float(np.sqrt(sigma2)), reps=3)
            return m["median_s"] / BATCH, m

        lad = {"stage_m": list(stage_m), "stage_rates": list(spec["rates"]),
               "points": []}
        for ebn0 in spec["points"]:
            t0 = time.time()
            r = run_irharq(Z=64, stage_m=stage_m, ebn0_db=ebn0,
                           batch=BATCH, iters=ITERS, seed=0,
                           impl="auto", bg=bg, crc="crc24")
            # occupancy entering each stage (fraction still NACKed).
            # EVERY stage is timed (compile is cached per stage, later
            # points re-dispatch): t_full must include zero-occupancy
            # stages — "decode everything every stage" is its meaning
            # (review r5: skipping them inflated the bound several-
            # fold) — while t_lane weights by occupancy, where an
            # occ < MIN_OCC stage contributes < ~0.1% and may skip.
            occ = [1.0] + [s["fer_after"] for s in r.stages[:-1]]
            stage_t = []
            t_lane = t_full = 0.0
            lane_ok = full_ok = True
            for si, p in enumerate(occ):
                try:
                    t_s, meas = stage_cost_s(si, ebn0)
                except Exception as e:  # noqa: BLE001 — keep sweeping
                    stage_t.append({"occ": p,
                                    "error": f"{type(e).__name__}: {e}"})
                    full_ok = False
                    if p >= MIN_OCC:
                        lane_ok = False  # metric would be inflated
                    continue
                stage_t.append({"occ": p, "s_per_frame": t_s,
                                "dec_ms": meas["dec_ms"]})
                t_lane += p * t_s
                t_full += t_s
            kp = r.k_payload
            point = {
                "ebn0_db": ebn0,
                "stages": r.stages,
                "residual_fer": r.residual_fer,
                "false_acks": r.false_acks,
                "false_ack_rate": r.false_ack_rate,
                "frames": r.frames,
                "avg_bits_sent": r.avg_bits_sent,
                "avg_info_rate": r.avg_info_rate,
                "k_payload": kp,
                "stage_timing": stage_t,
                "eff_info_gbps_active_batching": (
                    kp * (1 - r.residual_fer) / t_lane / 1e9
                    if t_lane and lane_ok else None),
                "eff_info_gbps_full_vector": (
                    kp * (1 - r.residual_fer) / t_full / 1e9
                    if t_full and full_ok else None),
                "wall_s": round(time.time() - t0, 1),
            }
            lad["points"].append(point)
            res["ladders"][f"bg{bg}"] = lad
            tmp = OUT + ".tmp"
            with open(tmp, "w") as f:
                json.dump(res, f, indent=1)
            os.replace(tmp, OUT)
            print(f"bg{bg} {ebn0} dB: fer_stages "
                  f"{[round(s['fer_after'], 5) for s in r.stages]} "
                  f"false_acks={r.false_acks} rate "
                  f"{r.avg_info_rate:.4f} eff_gbps "
                  f"{point['eff_info_gbps_active_batching']}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
