"""Round-3 session-2 TPU measurement pass (run when the axon tunnel is
healthy; caller timeboxes with `timeout`).  One TPU process at a time —
never run concurrently with bench.py (tunnel contention corrupts both).

1. Gate: real-hardware bit-exactness of the current fused min-sum-50
   kernel vs the NumPy golden model (interpret mode cannot catch
   Mosaic-only lowering differences).
2. Frozen-waterfall regression: re-run the judged 7-point sweep with
   the fixture's exact config (batch 4096, target FE 200, max 2e6,
   seed 0) and compare counters bit-for-bit against
   tests/fixtures/judged_minsum50.csv.
3. Family throughput generalization: full-50 and layered-25 literal
   Gb/s for representative registry cells beyond the judged code
   (SURVEY C7/C8 evidence that kernel speed is not judged-code-special).
4. Champion anchors: the committed layered two-phase operating points
   (min-sum K=9/B=768, exact SP K=8/B=384) re-measured.

Writes artifacts/tpu_session_r3b.json incrementally after every step.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "tpu_session_r3b.json")


def save(results):
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def main():
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    results = {"date": time.strftime("%Y-%m-%d %H:%M"), "backend": "tpu"}

    from tpu_ldpc.benchcore import make_timer
    from tpu_ldpc.channel import noise_sigma2
    from tpu_ldpc.codes import LdpcCode
    from tpu_ldpc.decode.pallas_bp import build_pallas_decoder
    from tpu_ldpc.golden import decode as golden_decode

    judged = LdpcCode.judged()

    # --- 1. hardware bit-exactness gate ------------------------------
    t0 = time.time()
    timer, _ = make_timer(judged, 512, ebn0_db=2.0, inner=60)
    sigma2 = noise_sigma2(2.0, judged.rate)
    rng = np.random.default_rng(42)
    x = np.asarray(timer.xj)
    llr = ((2.0 / sigma2) * (x + np.sqrt(sigma2)
           * rng.normal(size=x.shape))).astype(np.float32)
    gb, gok, git = golden_decode(judged.H, llr, algo="minsum", iters=50,
                                 dtype=np.float32)
    fn = build_pallas_decoder(judged, iters=50)
    pb, pok, pit = map(np.asarray, fn(llr))
    results["bitexact_vs_golden_minsum50"] = bool(
        np.array_equal(gb, pb) and np.array_equal(gok, pok)
        and np.array_equal(git, pit))
    results["bitexact_gate_s"] = round(time.time() - t0, 1)
    print("gate:", results["bitexact_vs_golden_minsum50"], flush=True)
    save(results)
    assert results["bitexact_vs_golden_minsum50"], "HW bit-exactness FAILED"

    # --- 2. frozen-waterfall regression ------------------------------
    from tpu_ldpc.sim.mc import DecodeCfg, run_ber

    t0 = time.time()
    fixture = {}
    path = os.path.join(REPO, "tests", "fixtures", "judged_minsum50.csv")
    for ln in open(path).read().splitlines():
        if ln.startswith("#") or ln.startswith("ebn0"):
            continue
        f = ln.split(",")
        fixture[float(f[0])] = tuple(int(v) for v in f[1:7])
    grid = sorted(fixture)
    res = run_ber(judged, grid, DecodeCfg(algo="minsum", iters=50,
                                          alpha=0.75, impl="pallas"),
                  batch=4096, target_frame_errors=200,
                  max_frames=2_000_000, seed=0, steps_per_call=8)
    mism = []
    for r in res:
        got = (r.frames, r.bit_errors, r.frame_errors, r.detected,
               r.undetected, r.iter_sum)
        if got != fixture[r.ebn0_db]:
            mism.append({"ebn0": r.ebn0_db, "got": got,
                         "want": fixture[r.ebn0_db]})
    results["waterfall_fixture_points"] = len(grid)
    results["waterfall_fixture_mismatches"] = mism
    results["waterfall_regression_s"] = round(time.time() - t0, 1)
    print("waterfall regression:",
          "PASS" if not mism else mism, flush=True)
    save(results)

    # --- 3. family-cell throughput -----------------------------------
    cells = [("wifi", "1/2", 81), ("wifi", "5/6", 81),
             ("wimax", "1/2", 96), ("wimax", "1/2", 24)]
    fam = {}
    for family, rate, z in cells:
        code = LdpcCode.from_family(family, rate, z)
        t, _ = make_timer(code, 4096, ebn0_db=2.0, inner=60)
        row = {"n": code.n, "k": code.k}
        for tag, kw in (("minsum50", dict(iters=50)),
                        ("layered25", dict(iters=25, schedule="layered"))):
            d = t.measure(build_pallas_decoder(
                code, algo="minsum", alpha=0.75, early_stop=False, **kw),
                reps=3)["median_s"]
            row[f"{tag}_gbps"] = round(4096 * code.k / d / 1e9, 3)
        fam[f"{family}_r{rate.replace('/', '')}_z{z}"] = row
        print("family:", family, rate, z, row, flush=True)
        results["family_throughput"] = fam
        save(results)

    # --- 4. champion anchors ------------------------------------------
    from tpu_ldpc.decode.twophase import build_twophase_decoder

    t, _ = make_timer(judged, 4096, ebn0_db=2.0, inner=60)
    anchors = {}
    d = t.measure(build_pallas_decoder(judged, iters=50), reps=3)["median_s"]
    anchors["minsum50_literal_gbps"] = round(4096 * judged.k / d / 1e9, 3)
    for tag, kw in (
        ("minsum_layered_tp_K9_B768",
         dict(algo="minsum", iters=25, phase1_iters=9, budget=768,
              schedule="layered")),
        ("sp_layered_tp_K8_B384",
         dict(algo="sumproduct", iters=25, phase1_iters=8, budget=384,
              schedule="layered")),
    ):
        tp = build_twophase_decoder(judged, alpha=0.75, **kw)
        d = t.measure(tp, reps=3)["median_s"]
        anchors[f"{tag}_gbps"] = round(4096 * judged.k / d / 1e9, 3)
        print("anchor:", tag, anchors[f"{tag}_gbps"], flush=True)
    results["champion_anchors"] = anchors
    save(results)
    print("DONE", json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
