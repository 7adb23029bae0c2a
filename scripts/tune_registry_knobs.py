"""Registry-wide layered two-phase knob tuning (VERDICT r3 #3).

For every registry family cell: derive (K, budget) from the measured
iteration distribution at the cell's rate-appropriate operating point
(tune_phase1_iters on hardware), measure the layered two-phase
throughput with the inner=60 estimator, verify no budget overflow with
a real-noise fallback probe, and write the result into BOTH:

  - artifacts/tpu_registry_knobs.json  (full provenance, resumable)
  - tpu_ldpc/codes/data/twophase_knobs.json  (the registry metadata
    that decode/knobs.py resolves impl='twophase' knobs from)

Cells whose metadata entry is already 'measured' are kept (the r3
A/B-tuned champions: judged plateau + 3 family cells) unless --retune.
One TPU process at a time; caller timeboxes.  Atomic JSON writes.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "tpu_registry_knobs.json")
KNOBS = os.path.join(REPO, "tpu_ldpc", "codes", "data",
                     "twophase_knobs.json")

# near the min-sum FER~1e-2 waterfall point per rate (BASELINE.md);
# 1/2 and 5/6 match the r3 family-twophase artifact's points
EBN0_BY_RATE = {"1/2": 1.9, "2/3": 2.4, "3/4": 2.8, "5/6": 3.6}

BATCH = 4096
ITERS = 25  # layered-25 == flooding-50 FER (judged_layered25.csv)


def _dump_atomic(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    retune = "--retune" in sys.argv

    from tpu_ldpc.benchcore import make_timer
    from tpu_ldpc.codes import LdpcCode
    from tpu_ldpc.decode.twophase import (
        build_twophase_decoder,
        tune_phase1_iters,
    )

    results = {"date": time.strftime("%Y-%m-%d %H:%M"), "cells": {}}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results["cells"] = json.load(f).get("cells", {})
    with open(KNOBS) as f:
        knobs = json.load(f)

    def all_cells():
        from tpu_ldpc.codes.nrlike import nrlike_code

        for fam, lifts in (("wifi", (27, 54, 81)),
                           ("wimax", (24, 48, 96))):
            for rate in ("1/2", "2/3", "3/4", "5/6"):
                for z in lifts:
                    yield (LdpcCode.from_family(fam, rate, z),
                           EBN0_BY_RATE[rate])
        # NR-like cells: operating points from the measured r4
        # waterfalls (the family's steep curves sit LOWER than the
        # wifi/wimax per-rate points; FER ~1e-3..1e-2 region)
        for rate, ebn0 in (("1/2", 1.65), ("2/3", 2.6), ("3/4", 2.9),
                           ("5/6", 3.4)):
            yield (nrlike_code(rate, 64), ebn0)
        # z32 second lift (r5, VERDICT r4 #9): +0.4 dB for the shorter
        # blocks (CPU probes 2026-08-21); nr2 z32 rates included (the
        # nr2 z64 knobs were measured by a separate r4 session script)
        for rate, ebn0 in (("1/2", 2.05), ("2/3", 3.0), ("3/4", 3.3),
                           ("5/6", 3.8)):
            yield (nrlike_code(rate, 32), ebn0)
        for rate, ebn0 in (("1/5", 1.4), ("2/7", 1.7), ("2/5", 2.1),
                           ("1/2", 2.4), ("2/3", 3.0)):
            yield (nrlike_code(rate, 32, bg=2), ebn0)

    for code, ebn0 in all_cells():
                cell = code.name
                prior = knobs["cells"].get(cell, {}).get("layered")
                # --retune overrides BOTH skip conditions (review r4:
                # the artifact-resume check used to fire first, making
                # --retune a no-op after any completed sweep)
                if not retune:
                    if cell in results["cells"]:
                        print(f"{cell}: done this sweep, skip",
                              flush=True)
                        continue
                    if prior and "measured" in prior.get("source", ""):
                        print(f"{cell}: measured metadata exists, skip",
                              flush=True)
                        continue
                t0 = time.time()
                try:
                    K, budget, stats = tune_phase1_iters(
                        code, ebn0_db=ebn0, batch=BATCH, iters=ITERS,
                        seed=3, schedule="layered", alpha=0.75)
                except NotImplementedError as e:
                    # guarded kernel capability rejection (e.g.
                    # nr1_r12_z64's layered+ET state exceeds the VMEM
                    # budget): record and move on — impl='twophase'
                    # for such a cell routes through the jnp/sharded
                    # fallbacks, so no knobs apply
                    results["cells"][cell] = {"skipped": str(e)}
                    _dump_atomic(OUT, results)
                    print(f"{cell}: SKIP ({e})", flush=True)
                    continue
                except Exception as e:  # noqa: BLE001 — review r5: a
                    # runtime fault in a PRIOR cell's measure poisons
                    # the process, so the next tune can raise too;
                    # record and keep sweeping (one fault costs only
                    # the cells it actually hits)
                    results["cells"][cell] = {
                        "error": f"tune: {type(e).__name__}: {e}",
                        "wall_s": round(time.time() - t0, 1)}
                    _dump_atomic(OUT, results)
                    print(f"{cell}: TUNE FAILED ({type(e).__name__}) "
                          "— continuing", flush=True)
                    continue
                # ADVICE r4: on the NR cells, tune + benchcore measure
                # in ONE process reproducibly faults the remote
                # runtime (CLAUDE.md r4 landmine) — a crash here must
                # not lose the rest of the sweep, so anything the
                # measure throws is recorded and the loop continues
                # (the tuned K/budget are still kept for a later
                # split-process measure).
                try:
                    tp = build_twophase_decoder(
                        code, iters=ITERS, phase1_iters=K, budget=budget,
                        schedule="layered", algo="minsum", alpha=0.75)
                    t, _ = make_timer(code, BATCH, ebn0_db=ebn0, inner=60)
                    d = t.measure(tp, reps=3)["median_s"]
                    gbps = round(BATCH * code.k / d / 1e9, 3)
                    # real-noise fallback probe: n_unconv > budget would
                    # mean every timed dispatch paid the ~2x fallback
                    tpf = build_twophase_decoder(
                        code, iters=ITERS, phase1_iters=K, budget=budget,
                        schedule="layered", algo="minsum", alpha=0.75,
                        report_fallback=True)
                    llr = t.scale * (t.xj + t.sig * jax.random.normal(
                        jax.random.key(11), t.xj.shape, jnp.float32))
                    n_unconv = int(np.asarray(tpf(llr)[3]))
                except Exception as e:  # noqa: BLE001 — remote fault
                    results["cells"][cell] = {
                        "error": f"{type(e).__name__}: {e}",
                        "K": K, "budget": budget,
                        "wall_s": round(time.time() - t0, 1)}
                    _dump_atomic(OUT, results)
                    # review r5: the tuned knobs are still better than
                    # the rate-derived fallback — ship them to the
                    # registry with honest unmeasured provenance (a
                    # later successful sweep overwrites)
                    if not (prior and "measured" in prior.get(
                            "source", "")):
                        knobs["cells"].setdefault(cell, {})["layered"] = {
                            "K": K, "budget": budget, "iters": ITERS,
                            "ebn0_db": ebn0,
                            "source": ("tuned " + time.strftime("%Y-%m-%d")
                                       + ", measure failed "
                                       "(scripts/tune_registry_knobs.py)")}
                        _dump_atomic(KNOBS, knobs)
                    print(f"{cell}: MEASURE FAILED "
                          f"({type(e).__name__}: {e}) — tuned knobs "
                          "recorded, continuing", flush=True)
                    continue
                row = {"n": code.n, "k": code.k, "ebn0_db": ebn0,
                       "K": K, "budget": budget, "tune_stats": stats,
                       "layered_twophase_gbps": gbps,
                       "n_unconv_seed11": n_unconv,
                       "fallback_fired": n_unconv > budget,
                       "wall_s": round(time.time() - t0, 1)}
                results["cells"][cell] = row
                _dump_atomic(OUT, results)
                knobs["cells"].setdefault(cell, {})["layered"] = {
                    "K": K, "budget": budget, "iters": ITERS,
                    "ebn0_db": ebn0,
                    "source": ("measured " + time.strftime("%Y-%m-%d")
                               + f" {gbps} Gb/s "
                               "(scripts/tune_registry_knobs.py)")}
                _dump_atomic(KNOBS, knobs)
                print(cell, row, flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
