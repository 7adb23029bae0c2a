"""Phase-1-cost experiment (VERDICT r3 #7): "minsum-hybrid" layered
two-phase — phase 1 at alpha=1.0 (pure min-sum, no per-edge multiply:
the kernel's only measured-live cost lever, -8% time on flooding),
phase 2 unchanged at alpha=0.75.

NOT bit-identical to any single-pass decoder (lanes converging in
phase 1 carry pure-min-sum trajectories), so the FER claim is measured
FIRST, paired-noise, before any throughput claim:

  1. FER A/B: one jitted fori_loop decodes the SAME on-device noise
     realizations with the champion (phase1 alpha 0.75) and the hybrid
     (phase1 alpha 1.0); counts frame errors for both plus the
     discordant pairs (McNemar-style — paired comparison is far more
     sensitive than two independent FER estimates).
  2. Straggler check: fallback probe for the hybrid at the champion's
     (K, budget) — pure min-sum may converge less often inside K.
  3. Throughput: inner=60 estimator, hybrid vs champion, plus hybrid
     at a retuned (K, budget) from its own iteration distribution.

Writes artifacts/hybrid_phase1_alpha.json (atomic).  One TPU process
at a time; caller timeboxes.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "hybrid_phase1_alpha.json")

BATCH = 4096
INNER = 100        # paired-noise steps per dispatch
DISPATCHES = 5     # 5 * 100 * 4096 = 2.048M paired frames
EBN0 = 2.0
K, BUDGET = 9, 768  # champion knobs (tpu_tune_twophase_r3b.json)


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()

    from tpu_ldpc.benchcore import make_timer
    from tpu_ldpc.codes import LdpcCode
    from tpu_ldpc.decode.twophase import (
        build_twophase_decoder,
        tune_phase1_iters,
    )

    code = LdpcCode.judged()
    res = {"date": time.strftime("%Y-%m-%d %H:%M"), "ebn0_db": EBN0,
           "batch": BATCH, "frames": DISPATCHES * INNER * BATCH,
           "knobs": {"K": K, "budget": BUDGET}}

    base = build_twophase_decoder(
        code, iters=25, phase1_iters=K, budget=BUDGET,
        schedule="layered", algo="minsum", alpha=0.75)
    hyb = build_twophase_decoder(
        code, iters=25, phase1_iters=K, budget=BUDGET,
        schedule="layered", algo="minsum", alpha=0.75, phase1_alpha=1.0)

    timer, u = make_timer(code, BATCH, ebn0_db=EBN0, inner=60)
    uj = jnp.asarray(u)
    xj, scale, sig = timer.xj, timer.scale, timer.sig

    @jax.jit
    def paired_fer(key0):
        def body(i, acc):
            key = jax.random.fold_in(key0, i)
            llr = scale * (xj + sig * jax.random.normal(
                key, xj.shape, jnp.float32))
            bb, _, _ = base(llr)
            hb, _, _ = hyb(llr)
            eb = (bb[:, : code.k] != uj).any(axis=1)
            eh = (hb[:, : code.k] != uj).any(axis=1)
            return (acc[0] + jnp.sum(eb), acc[1] + jnp.sum(eh),
                    acc[2] + jnp.sum(eb & ~eh), acc[3] + jnp.sum(~eb & eh))
        z = jnp.int32(0)
        return jax.lax.fori_loop(0, INNER, body, (z, z, z, z))

    fe_b = fe_h = d_bh = d_hb = 0
    for rep in range(DISPATCHES):
        a, b, c, d = map(int, jax.block_until_ready(
            paired_fer(jax.random.key(100 + rep))))
        fe_b += a; fe_h += b; d_bh += c; d_hb += d
        print(f"rep {rep}: base {a} hyb {b} (base-only {c} hyb-only {d})",
              flush=True)
    n = DISPATCHES * INNER * BATCH
    res["fer"] = {
        "base_fe": fe_b, "hybrid_fe": fe_h,
        "base_fer": fe_b / n, "hybrid_fer": fe_h / n,
        "discordant_base_only_fails": d_bh,
        "discordant_hybrid_only_fails": d_hb,
        "relative_delta": (fe_h - fe_b) / max(fe_b, 1)}
    print(res["fer"], flush=True)

    # straggler/fallback probe at champion knobs
    hybf = build_twophase_decoder(
        code, iters=25, phase1_iters=K, budget=BUDGET,
        schedule="layered", algo="minsum", alpha=0.75, phase1_alpha=1.0,
        report_fallback=True)
    llr = scale * (xj + sig * jax.random.normal(
        jax.random.key(7), xj.shape, jnp.float32))
    res["hybrid_n_unconv_seed7"] = int(np.asarray(hybf(llr)[3]))

    # throughput A/B at champion knobs
    res["base_gbps"] = round(
        BATCH * code.k / timer.measure(base, reps=3)["median_s"] / 1e9, 4)
    res["hybrid_gbps"] = round(
        BATCH * code.k / timer.measure(hyb, reps=3)["median_s"] / 1e9, 4)
    print({k: res[k] for k in ("base_gbps", "hybrid_gbps",
                               "hybrid_n_unconv_seed7")}, flush=True)

    # retune (K, budget) for the hybrid's own iteration distribution
    # (pure min-sum converges differently inside phase 1)
    K2, B2, stats = tune_phase1_iters(
        code, ebn0_db=EBN0, batch=BATCH, iters=25, seed=3,
        schedule="layered", alpha=1.0)
    res["hybrid_retuned"] = {"K": K2, "budget": B2, "stats": stats}
    if (K2, B2) != (K, BUDGET):
        hyb2 = build_twophase_decoder(
            code, iters=25, phase1_iters=K2, budget=B2,
            schedule="layered", algo="minsum", alpha=0.75,
            phase1_alpha=1.0)
        res["hybrid_retuned"]["gbps"] = round(
            BATCH * code.k / timer.measure(hyb2, reps=3)["median_s"] / 1e9,
            4)
    print(res["hybrid_retuned"], flush=True)

    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f, indent=1)
    os.replace(tmp, OUT)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
