"""IR-HARQ operating curve on hardware (sim/harq.py over the NR-like
z64 mother): per-Eb/N0 stage FERs + effective info rate.

Writes artifacts/nr1_irharq.json (atomic).  One TPU process at a time.
"""

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "nr1_irharq.json")


def main():
    import jax

    from tpu_ldpc.sim.harq import run_irharq

    assert jax.default_backend() == "tpu", jax.default_backend()
    res = {"date": time.strftime("%Y-%m-%d %H:%M"), "Z": 64,
           "stage_m": [7, 10, 13, 24], "batch": 4096,
           "impl": "auto", "points": []}
    for ebn0 in (2.0, 2.5, 3.0, 3.5, 4.0):
        t0 = time.time()
        r = run_irharq(Z=64, stage_m=(7, 10, 13, 24), ebn0_db=ebn0,
                       batch=4096, iters=50, seed=0, impl="auto")
        rec = dataclasses.asdict(r)
        rec["residual_fer"] = r.residual_fer
        rec["wall_s"] = round(time.time() - t0, 1)
        res["points"].append(rec)
        print(ebn0, "dB:", [round(s["fer_after"], 5) for s in r.stages],
              "rate", round(r.avg_info_rate, 4), flush=True)
        tmp = OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(res, f, indent=1)
        os.replace(tmp, OUT)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
