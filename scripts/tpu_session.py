"""One-shot TPU measurement session for round 2 (run when the axon
tunnel is healthy; every step is timeboxed by the caller's `timeout`).

1. Real-hardware bit-exactness: the normalized (shift-relabeled) Pallas
   kernel vs the golden model on a fixed 4096-frame batch — interpret
   mode cannot catch Mosaic-only lowering differences (e.g. roll
   semantics, FMA fusion), so this is the gate for the r2 kernel
   changes.
2. bench.py-equivalent headline via benchcore (median + best).
3. A/B: normalize on/off, unroll 1/2/4 (flat early_stop=False loop).
4. sumproduct-fast full-50 + ET; two-phase ET for minsum and spfast.

Writes artifacts/tpu_session_r2.json; prints progress as it goes.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "tpu_session_r2.json")


def main():
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    results = {"date": time.strftime("%Y-%m-%d %H:%M"), "backend": "tpu"}

    from tpu_ldpc.benchcore import make_timer
    from tpu_ldpc.channel import noise_sigma2
    from tpu_ldpc.codes import LdpcCode
    from tpu_ldpc.decode.pallas_bp import build_pallas_decoder
    from tpu_ldpc.golden import decode as golden_decode

    code = LdpcCode.judged()
    batch, iters = 4096, 50

    # --- 1. real-HW bit-exactness of the normalized kernel -----------
    timer, u = make_timer(code, batch, ebn0_db=2.0, inner=20)
    x = np.asarray(timer.xj)
    sigma2 = noise_sigma2(2.0, code.rate)
    rng = np.random.default_rng(42)
    llr = ((2.0 / sigma2) * (x + np.sqrt(sigma2)
           * rng.normal(size=x.shape))).astype(np.float32)
    t0 = time.time()
    gb, gok, git = golden_decode(code.H, llr[:512], algo="minsum",
                                 iters=iters, dtype=np.float32)
    for norm in (True, False):
        fn = build_pallas_decoder(code, iters=iters, normalize=norm)
        pb, pok, pit = map(np.asarray, fn(llr[:512]))
        key = f"bitexact_vs_golden_normalize_{norm}"
        results[key] = bool(
            np.array_equal(gb, pb) and np.array_equal(gok, pok)
            and np.array_equal(git, pit)
        )
        print(key, results[key], f"{time.time()-t0:.0f}s", flush=True)
        assert results[key], "REAL-HW BIT-EXACTNESS FAILED"

    # quantized datapath on real Mosaic (ADVICE r1 low: the pow2-step
    # rounding contract was only pinned in interpret mode)
    gqb, gqok, gqit = golden_decode(code.H, llr[:512], algo="minsum",
                                    iters=20, quant_bits=6,
                                    quant_step=0.5, dtype=np.float32)
    qfn = build_pallas_decoder(code, iters=20, quant_bits=6,
                               quant_step=0.5)
    qb, qok, qit = map(np.asarray, qfn(llr[:512]))
    results["bitexact_quant6"] = bool(
        np.array_equal(gqb, qb) and np.array_equal(gqok, qok)
        and np.array_equal(gqit, qit)
    )
    print("bitexact_quant6", results["bitexact_quant6"], flush=True)
    assert results["bitexact_quant6"]

    # sumproduct-fast PWL contract on real Mosaic (FMA-safe claim)
    gsb, gsok, gsit = golden_decode(code.H, llr[:512],
                                    algo="sumproduct-fast", iters=20,
                                    dtype=np.float32)
    sfn = build_pallas_decoder(code, algo="sumproduct-fast", iters=20)
    sb, sok, sit = map(np.asarray, sfn(llr[:512]))
    results["bitexact_spfast"] = bool(
        np.array_equal(gsb, sb) and np.array_equal(gsok, sok)
        and np.array_equal(gsit, sit)
    )
    print("bitexact_spfast", results["bitexact_spfast"], flush=True)
    assert results["bitexact_spfast"]

    # --- 2/3. headline + A/B -----------------------------------------
    def meas(tag, dec, reps=5):
        m = timer.measure(dec, reps=reps)
        gbps = batch * code.k / m["median_s"] / 1e9
        results[tag] = {
            "gbps_median": round(gbps, 4),
            "gbps_best": round(batch * code.k / m["best_s"] / 1e9, 4),
            "dec_ms": m["dec_ms"], "gen_ms": m["gen_ms"],
        }
        print(tag, results[tag]["gbps_median"], "Gb/s (median)", flush=True)
        return gbps

    for norm in (True, False):
        for unroll in ((1, 2, 5) if norm else (1,)):
            meas(f"minsum50_full_norm{int(norm)}_unroll{unroll}",
                 build_pallas_decoder(code, iters=iters, early_stop=False,
                                      normalize=norm, unroll=unroll))

    # --- 4. spfast + ET variants --------------------------------------
    meas("spfast50_full", build_pallas_decoder(
        code, algo="sumproduct-fast", iters=iters, early_stop=False))
    meas("minsum_et", build_pallas_decoder(code, iters=iters,
                                           early_stop=True), reps=3)
    meas("spfast_et", build_pallas_decoder(
        code, algo="sumproduct-fast", iters=iters, early_stop=True),
        reps=3)
    meas("sumproduct_et", build_pallas_decoder(
        code, algo="sumproduct", iters=iters, early_stop=True), reps=3)

    from tpu_ldpc.decode.twophase import build_twophase_decoder

    for algo in ("minsum", "sumproduct-fast"):
        meas(f"{algo}_twophase_et", build_twophase_decoder(
            code, iters=iters, phase1_iters=16, budget=512, algo=algo),
            reps=3)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
