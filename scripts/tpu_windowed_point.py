"""Windowed SC decoder: hardware throughput + FER point (VERDICT r4 #7).

The lax.scan windowed decoder (decode/windowed.py) is tested bit-exact
vs full-window flooding on CPU but had never been MEASURED on TPU.
One measured point decides: if windowed throughput is within ~2x of
the full-graph fused kernel at comparable FER, the long-context story
stands on the jnp path; if not, a Pallas windowed variant would be
warranted (DESIGN.md §5.1 gets the verdict either way).

Config: L=32 / Z=64 chain (the committed SC artifact's cell), W
scanned over {4, 6, 8} with 3 iterations per slide (windowed needs
the directional wave AND a window wide enough to span the coupling
memory — W=4 measured FER ~1.0 while W=6 decodes), vs the best
single-chip full-graph decoder.  Operating point 2.0 dB (flooding-50
FER 1.0e-2 there).

Writes artifacts/tpu_windowed_point.json (atomic).  One TPU process
at a time.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "tpu_windowed_point.json")

L, Z, IPW = 32, 64, 3
W_SCAN = (4, 6, 8)
EBN0 = 2.0
BATCH = 1024
FER_FRAMES = 16384


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ldpc.benchcore import LoopTimer
    from tpu_ldpc.channel import noise_sigma2
    from tpu_ldpc.codes import LdpcCode, make_sc_base_graph
    from tpu_ldpc.decode.pallas_bp import build_pallas_decoder
    from tpu_ldpc.decode.windowed import build_windowed_decoder
    from tpu_ldpc.encode.encoder import select_encoder
    from tpu_ldpc.sim.mc import DecodeCfg, run_ber

    assert jax.default_backend() == "tpu", jax.default_backend()

    code = LdpcCode("sc_l32_z64", make_sc_base_graph(L, Z), Z)
    encode_fn, k, info_cols = select_encoder(code)
    rate = k / code.n  # true rate (rank-deficient terminated chain)
    sigma2 = noise_sigma2(EBN0, rate)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (BATCH, k)).astype(np.uint8)
    c = np.asarray(jax.device_get(encode_fn(jnp.asarray(u))))
    x = (1.0 - 2.0 * c).astype(np.float32)
    timer = LoopTimer(x, scale=2.0 / sigma2,
                      sig=float(np.sqrt(sigma2)), inner=20)

    res = {"date": time.strftime("%Y-%m-%d %H:%M"), "cell": code.name,
           "n": code.n, "k": k, "iters_per_window": IPW,
           "ebn0_db": EBN0, "batch": BATCH, "windowed": {}}

    for W in W_SCAN:
        wdec = build_windowed_decoder(code, window=W,
                                      iters_per_window=IPW)
        m = timer.measure(jax.jit(wdec), reps=5)
        r = run_ber(code, [EBN0],
                    cfg=DecodeCfg(schedule="windowed", window=W,
                                  iters=IPW, impl="jnp"),
                    batch=2048, target_frame_errors=10**9,
                    max_frames=FER_FRAMES, seed=1)[0]
        res["windowed"][f"W{W}"] = {
            "gbps": round(BATCH * k / m["median_s"] / 1e9, 4),
            "ms_per_batch": round(m["median_s"] * 1e3, 3),
            "fer": r.fer, "mean_iters": round(r.mean_iters, 2),
        }
        print(f"windowed W={W}:", res["windowed"][f"W{W}"], flush=True)

    try:
        fdec = build_pallas_decoder(code, algo="minsum", iters=50,
                                    alpha=0.75, early_stop=True)
        res["flooding_impl"] = "pallas"
    except NotImplementedError as e:
        # the L=32 chain's full-graph state exceeds the single-chip
        # VMEM budget (~15.2 MB vs 12.06) — the exact regime windowed
        # and ring decoding exist for.  The single-chip full-graph
        # comparator is then the XLA reference decoder.
        from tpu_ldpc.decode.reference import build_decoder

        res["flooding_vmem_rejected"] = str(e)
        fdec = build_decoder(code, algo="minsum", iters=50,
                             alpha=0.75, early_stop=True)
        res["flooding_impl"] = "jnp"
    m = timer.measure(fdec, reps=5)
    res["flooding50_gbps"] = round(BATCH * k / m["median_s"] / 1e9, 4)
    r = run_ber(code, [EBN0], cfg=DecodeCfg(iters=50, impl="auto"),
                batch=2048, target_frame_errors=10**9,
                max_frames=FER_FRAMES, seed=1)[0]
    res["fer_flooding50"] = r.fer
    res["mean_iters_flooding50"] = round(r.mean_iters, 2)
    print("flooding50:", res["flooding_impl"], res["flooding50_gbps"],
          "Gb/s FER", r.fer, flush=True)

    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f, indent=1)
    os.replace(tmp, OUT)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
