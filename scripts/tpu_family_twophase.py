"""Champion-operating-point generalization: layered two-phase ET on
family cells (not just the judged code).

For each chosen cell: derive (K, budget) from the measured iteration
distribution at the cell's rate-appropriate operating point
(tune_phase1_iters on hardware outputs), then measure layered-25
literal vs layered two-phase with the inner=60 estimator.  One TPU
process at a time; caller timeboxes.

Writes artifacts/tpu_family_twophase.json incrementally.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "tpu_family_twophase.json")

# near the min-sum FER~1e-2 waterfall point per rate (BASELINE.md)
EBN0_BY_RATE = {"1/2": 1.9, "5/6": 3.6}

CELLS = [("wifi", "1/2", 81), ("wimax", "1/2", 96), ("wifi", "5/6", 81)]


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    # resume-aware (the tunnel dies for hours): completed cells are
    # kept from a previous partial run and skipped
    results = {"date": time.strftime("%Y-%m-%d %H:%M"), "cells": {}}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results["cells"] = json.load(f).get("cells", {})

    from tpu_ldpc.benchcore import make_timer
    from tpu_ldpc.codes import LdpcCode
    from tpu_ldpc.decode.pallas_bp import build_pallas_decoder
    from tpu_ldpc.decode.twophase import (
        build_twophase_decoder,
        tune_phase1_iters,
    )

    batch = 4096
    for fam, rate, z in CELLS:
        cell = f"{fam}_r{rate.replace('/', '')}_z{z}"
        if cell in results["cells"]:
            print(f"{cell}: done, skip", flush=True)
            continue
        code = LdpcCode.from_family(fam, rate, z)
        ebn0 = EBN0_BY_RATE[rate]
        K, budget, stats = tune_phase1_iters(
            code, ebn0_db=ebn0, batch=batch, iters=25, seed=3,
            schedule="layered", alpha=0.75)
        row = {"n": code.n, "k": code.k, "ebn0_db": ebn0, "K": K,
               "budget": budget, "tune_stats": stats}
        t, _ = make_timer(code, batch, ebn0_db=ebn0, inner=60)
        d = t.measure(build_pallas_decoder(
            code, iters=25, schedule="layered", alpha=0.75,
            early_stop=False), reps=3)["median_s"]
        row["layered25_literal_gbps"] = round(batch * code.k / d / 1e9, 3)
        tp = build_twophase_decoder(
            code, iters=25, phase1_iters=K, budget=budget,
            schedule="layered", algo="minsum", alpha=0.75)
        d = t.measure(tp, reps=3)["median_s"]
        row["layered_twophase_gbps"] = round(batch * code.k / d / 1e9, 3)
        # MEASURE the no-overflow claim (review r3: it was inferred):
        # one real-noise decode with the fallback counter exposed —
        # n_unconv > budget would mean every timed dispatch above paid
        # the silent ~2x full-batch fallback
        tpf = build_twophase_decoder(
            code, iters=25, phase1_iters=K, budget=budget,
            schedule="layered", algo="minsum", alpha=0.75,
            report_fallback=True)
        llr = t.scale * (t.xj + t.sig * jax.random.normal(
            jax.random.key(11), t.xj.shape, jnp.float32))
        row["n_unconv_seed11"] = int(np.asarray(tpf(llr)[3]))
        row["fallback_fired"] = row["n_unconv_seed11"] > budget
        results["cells"][cell] = row
        print(cell, row, flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
