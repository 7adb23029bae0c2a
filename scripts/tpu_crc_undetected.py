"""CRC undetected-error measurement on the nr2_r15 floor (VERDICT r4
#1 "measure P(undetected | CRC pass)" — the regime where it matters).

The trapping census (artifacts/nr2_trapping_census.json) measured that
at 1.2-1.4 dB the rate-1/5 cell decodes to syndrome-clean WRONG
codewords (weight-43/50/52 — the d_min certificate live) at ~7e-5:
exactly the events an inner syndrome check cannot see and an outer CRC
exists to catch.  This script runs the CRC-gated MC harness at those
points and records, per Eb/N0:

  * syndrome-gated undetected rate (ok & wrong — the control, no CRC);
  * CRC-gated undetected rate (crc pass & payload wrong — false ACKs);
  * genie FER for both arms.

Expected: the syndrome arm shows O(census) undetected events; the
crc24 arm shows ZERO (leakage 2^-24 per near-codeword event).  A
nonzero crc24 count would be a finding.

Caveat (review r5): the arms share ebn0_db but NOT noise level — the
CRC arm's Eb/N0 references the PAYLOAD rate (616/n_tx vs 640/n_tx),
so it runs ~0.17 dB noisier with 24 deterministic info bits.  That
makes the zero-false-ACK conclusion CONSERVATIVE (the CRC arm sees
more failure events per frame), but the per-point undetected_rate
columns are not a noise-matched A/B; to noise-match, run the
syndrome arm at ebn0_db - 10*log10(640/616).

Writes artifacts/crc_undetected.json (atomic).  One TPU process at a
time.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "crc_undetected.json")

POINTS = (1.2, 1.4)
MAX_FRAMES = 262144
BATCH = 4096


def main():
    import jax

    from tpu_ldpc.cli.config import CodeSpec, ChannelCfg
    from tpu_ldpc.sim.mc import DecodeCfg, run_ber

    assert jax.default_backend() == "tpu", jax.default_backend()

    code = CodeSpec(family="nr2", rate="1/5", Z=64).build()
    adapt = ChannelCfg().build_adapt(code)  # standard 2-block puncture
    cfg = DecodeCfg(algo="minsum", iters=50, impl="pallas")

    res = {"date": time.strftime("%Y-%m-%d %H:%M"), "cell": code.name,
           "channel": "punctured (first 2Z)", "iters": 50,
           "max_frames": MAX_FRAMES, "points": []}
    for ebn0 in POINTS:
        rec = {"ebn0_db": ebn0}
        for arm, crc in (("syndrome", None), ("crc24", "crc24")):
            t0 = time.time()
            r = run_ber(code, [ebn0], cfg=cfg, batch=BATCH,
                        target_frame_errors=10**9,
                        max_frames=MAX_FRAMES, seed=7, adapt=adapt,
                        crc=crc)[0]
            rec[arm] = {
                "frames": r.frames, "fer": r.fer,
                "detected": r.detected, "undetected": r.undetected,
                "undetected_rate": r.undetected / r.frames,
                "wall_s": round(time.time() - t0, 1),
            }
            print(f"{ebn0} dB {arm}: frames={r.frames} fer={r.fer:.3e} "
                  f"undetected={r.undetected}", flush=True)
        res["points"].append(rec)
        tmp = OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(res, f, indent=1)
        os.replace(tmp, OUT)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
