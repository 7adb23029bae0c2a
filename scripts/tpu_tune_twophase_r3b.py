"""Champion-knob micro-grid for the layered two-phase operating points
(round 3, session 2).  One TPU process at a time; caller timeboxes.

Measures, with in-session literal anchors for window normalization:
  - committed champions: minsum K=9/B=768, exact SP K=8/B=384 (batch 4096)
  - neighboring (K, B) grid points for both algos
  - batch-8192 variants (fixed dispatch overhead amortizes; budget
    scales with batch so the straggler fraction coverage is unchanged)

Writes artifacts/tpu_tune_twophase_r3b.json incrementally.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "tpu_tune_twophase_r3b.json")


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    results = {"date": time.strftime("%Y-%m-%d %H:%M"),
               "ebn0_db": 2.0, "rows": []}

    from tpu_ldpc.benchcore import make_timer
    from tpu_ldpc.codes import LdpcCode
    from tpu_ldpc.decode.pallas_bp import build_pallas_decoder
    from tpu_ldpc.decode.twophase import build_twophase_decoder

    code = LdpcCode.judged()
    timers = {}

    def timer_for(batch):
        if batch not in timers:
            timers[batch] = make_timer(code, batch, ebn0_db=2.0,
                                       inner=60)[0]
        return timers[batch]

    def row(tag, batch, dec, extra=None):
        t = timer_for(batch)
        m = t.measure(dec, reps=3)
        gbps = batch * code.k / m["median_s"] / 1e9
        r = {"tag": tag, "batch": batch, "gbps": round(gbps, 3),
             "ms": round(m["median_s"] * 1e3, 4)}
        if extra:
            r.update(extra)
        results["rows"].append(r)
        print(r, flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        return gbps

    def tp(algo, K, B, batch):
        dec = build_twophase_decoder(
            code, iters=25, phase1_iters=K, budget=B, schedule="layered",
            algo=algo, alpha=0.75, report_fallback=True)
        t = timer_for(batch)
        llr = t.scale * (t.xj + t.sig * jax.random.normal(
            jax.random.key(7), t.xj.shape, jnp.float32))
        n_unconv = int(np.asarray(dec(llr)[3]))
        plain = build_twophase_decoder(
            code, iters=25, phase1_iters=K, budget=B, schedule="layered",
            algo=algo, alpha=0.75)
        row(f"{algo}_tp_K{K}_B{B}", batch, plain,
            {"n_unconv_seed7": n_unconv, "overflow": n_unconv > B})

    # anchors
    for batch in (4096, 8192):
        row("layered25_literal", batch, build_pallas_decoder(
            code, iters=25, schedule="layered", alpha=0.75,
            early_stop=False))

    # committed champions (batch 4096)
    tp("minsum", 9, 768, 4096)
    tp("sumproduct", 8, 384, 4096)

    # minsum neighbors
    for K, B in ((10, 512), (11, 384), (9, 640), (10, 640)):
        tp("minsum", K, B, 4096)
    # SP neighbors
    for K, B in ((9, 256), (7, 512), (8, 256)):
        tp("sumproduct", K, B, 4096)

    # batch-8192 variants (budget scaled with batch)
    tp("minsum", 9, 1536, 8192)
    tp("sumproduct", 8, 768, 8192)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
