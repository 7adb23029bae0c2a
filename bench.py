#!/usr/bin/env python
"""Driver benchmark: the judge metric, one JSON line on stdout.

Metric (BASELINE.json): decoded info bits/s/chip — normalized min-sum,
50 iterations, rate-1/2 (1024,512) QC-LDPC, batched decode on one chip.

The headline number is the conservative one: ALL 50 iterations executed
for every codeword (early termination disabled), decode-only (LLRs
pregenerated on device), fused Pallas kernel.  Supplementary numbers
(early-termination throughput at the FER~1e-2 operating point, layered
schedule) are printed to stderr.
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

    code = LdpcCode.judged()
    on_tpu = jax.default_backend() == "tpu"
    batch = 4096 if on_tpu else 256
    iters = 50
    ebn0_db = 2.0  # FER ~1e-2 operating point for this code

    # pregenerate LLRs on host with a fixed seed (decode-only timing)
    rng = np.random.default_rng(0)
    from tpu_ldpc.golden import encode as golden_encode

    u = rng.integers(0, 2, (batch, code.k)).astype(np.uint8)
    c = golden_encode(code.H, u)
    x = 1.0 - 2.0 * c
    sigma2 = noise_sigma2(ebn0_db, code.rate)
    llr = ((2.0 / sigma2) * (x + np.sqrt(sigma2) * rng.normal(size=x.shape))
           ).astype(np.float32)
    llr_d = jnp.asarray(llr)
    # distinct device-resident buffers, cycled per rep: defeats any
    # same-computation result caching in the runtime
    n_buf = 8
    llr_bufs = [llr_d] + [
        jnp.asarray(
            ((2.0 / sigma2)
             * (x + np.sqrt(sigma2) * rng.normal(size=x.shape))
             ).astype(np.float32)
        )
        for _ in range(n_buf - 1)
    ]

    def build(early_stop, schedule="flooding"):
        if on_tpu:
            from tpu_ldpc.decode.pallas_bp import build_pallas_decoder

            return build_pallas_decoder(
                code, algo="minsum", iters=iters, alpha=0.75,
                schedule=schedule, early_stop=early_stop,
            )
        from tpu_ldpc.decode.reference import build_decoder

        return build_decoder(
            code, algo="minsum", iters=iters, alpha=0.75,
            schedule=schedule, early_stop=early_stop,
        )

    def timeit(fn, reps):
        # block on every call (async dispatch makes last-result-only
        # blocking unreliable) and cycle distinct inputs (see above)
        r = fn(llr_d)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(llr_bufs[i % n_buf])
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps, r

    reps = 30 if on_tpu else 2
    dt_full, res = timeit(build(early_stop=False), reps)
    thpt = batch * code.k / dt_full

    # sanity: the decode must actually work at this SNR
    bits, ok, _ = map(np.asarray, res)
    fer = float((bits[:, : code.k] != u).any(axis=1).mean())

    extras = {"fer_at_2dB_full50": fer, "backend": jax.default_backend(),
              "batch": batch, "ms_per_batch": dt_full * 1e3}
    if on_tpu:
        dt_et, _ = timeit(build(early_stop=True), reps)
        extras["early_term_gbps"] = batch * code.k / dt_et / 1e9
        dt_lay, _ = timeit(build(early_stop=True, schedule="layered"), reps)
        extras["layered_et_gbps"] = batch * code.k / dt_lay / 1e9
    print(json.dumps(extras), file=sys.stderr)

    print(json.dumps({
        "metric": "minsum50_decoded_info_bits_per_s_per_chip",
        "value": round(thpt, 0),
        "unit": "bits/s",
        "vs_baseline": round(thpt / 1e9, 4),
    }))


if __name__ == "__main__":
    main()
