#!/usr/bin/env python
"""Driver benchmark: the judge metric, one JSON line on stdout.

Metric (BASELINE.json): decoded info bits/s/chip — normalized min-sum,
50 iterations, rate-1/2 (1024,512) QC-LDPC, batched decode on one chip.

Measurement method: N decode calls run inside ONE device computation
(lax.fori_loop over fresh keyed LLR generations), minus the cost of the
generation-only loop.  Host-side per-call timing is unusable here: the
remote-TPU dispatch path has ~25 ms round trips and caches repeated
identical computations, which produced wildly wrong numbers both ways.

Headline = conservative: all 50 iterations executed for every codeword
(early termination disabled).  Supplementary numbers (early-termination
at the FER~1e-2 operating point, layered schedule, sum-product) go to
stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ldpc.codes import LdpcCode
    from tpu_ldpc.channel import noise_sigma2
    from tpu_ldpc.golden import encode as golden_encode

    code = LdpcCode.judged()
    on_tpu = jax.default_backend() == "tpu"
    batch = 4096 if on_tpu else 256
    inner = 20 if on_tpu else 2
    iters = 50
    ebn0_db = 2.0  # FER ~1e-2 operating point for this code

    rng = np.random.default_rng(0)
    sigma2 = noise_sigma2(ebn0_db, code.rate)
    u = rng.integers(0, 2, (batch, code.k)).astype(np.uint8)
    c = golden_encode(code.H, u)
    x = jnp.asarray((1.0 - 2.0 * c).astype(np.float32))
    scale, sig = float(2.0 / sigma2), float(np.sqrt(sigma2))

    def gen(key):
        return scale * (x + sig * jax.random.normal(key, x.shape, jnp.float32))

    def build(early_stop, schedule="flooding", algo="minsum"):
        if on_tpu:
            from tpu_ldpc.decode.pallas_bp import build_pallas_decoder

            return build_pallas_decoder(
                code, algo=algo, iters=iters, alpha=0.75,
                schedule=schedule, early_stop=early_stop,
            )
        from tpu_ldpc.decode.reference import build_decoder

        return build_decoder(
            code, algo=algo, iters=iters, alpha=0.75,
            schedule=schedule, early_stop=early_stop,
        )

    def make_loop(dec):
        @jax.jit
        def many(key0):
            def body(i, acc):
                llr = gen(jax.random.fold_in(key0, i))
                if dec is None:
                    return acc + jnp.sum(llr).astype(jnp.int32)
                _, _, iu = dec(llr)
                return acc + jnp.sum(iu)

            return jax.lax.fori_loop(0, inner, body, jnp.int32(0))

        return many

    def timed(dec, reps=3):
        fn = make_loop(dec)
        jax.block_until_ready(fn(jax.random.key(999)))
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jax.random.key(r)))
            best = min(best, time.perf_counter() - t0)
        return best / inner

    # NOTE: a cycled-prestored-buffer estimator was tried and REMOVED:
    # when the large input buffers repeat across dispatches the remote
    # runtime's computation cache fires even with a traced salt scalar
    # in the program, returning physically impossible times (40 batches
    # "decoded" in 0.2 ms).  Fresh keyed on-device generation per inner
    # step (timed() above) is the only measured-reliable pattern here.

    dt_gen = timed(None)
    dt_full = timed(build(early_stop=False)) - dt_gen
    thpt = batch * code.k / dt_full

    # correctness sanity at the operating point
    fn = build(early_stop=False)
    bits, ok, _ = map(np.asarray, fn(gen(jax.random.key(0))))
    fer = float((bits[:, : code.k] != u).any(axis=1).mean())

    extras = {
        "fer_at_2dB_full50": fer,
        "backend": jax.default_backend(),
        "batch": batch,
        "ms_per_batch_full50": dt_full * 1e3,
        "ms_llr_gen": dt_gen * 1e3,
    }
    if on_tpu:
        d = timed(build(early_stop=True)) - dt_gen
        extras["early_term_2dB_gbps"] = batch * code.k / d / 1e9
        d = timed(build(early_stop=True, schedule="layered")) - dt_gen
        extras["layered_et_2dB_gbps"] = batch * code.k / d / 1e9
        # layered converges ~2x faster per iteration: 25 layered
        # iterations match the flooding-50 FER curve within MC
        # confidence at every measured point (artifacts/
        # judged_layered25.csv), so this is the throughput at
        # EQUIVALENT error performance
        from tpu_ldpc.decode.pallas_bp import build_pallas_decoder

        lay25 = build_pallas_decoder(code, algo="minsum", iters=25,
                                     schedule="layered", early_stop=False)
        d = timed(lay25) - dt_gen
        extras["layered25_equivFER_gbps"] = batch * code.k / d / 1e9
        d = timed(build(early_stop=True, algo="sumproduct")) - dt_gen
        extras["sumproduct_et_2dB_gbps"] = batch * code.k / d / 1e9
    print(json.dumps(extras), file=sys.stderr)

    print(json.dumps({
        "metric": "minsum50_decoded_info_bits_per_s_per_chip",
        "value": round(thpt, 0),
        "unit": "bits/s",
        "vs_baseline": round(thpt / 1e9, 4),
    }))


if __name__ == "__main__":
    main()
