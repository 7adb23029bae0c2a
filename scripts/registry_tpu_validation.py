"""Registry-wide TPU validation (VERDICT r2 #2; [SPEC] config 4).

One paired-seed point per registry cell (24 family cells + judged):
the fused Pallas min-sum kernel on the REAL TPU decodes the same noisy
LLRs as the native CPU decoder (itself bit-exact vs the golden fp32
model — tests/test_native.py), and the outputs must agree BIT-EXACTLY
on (bits, ok, iters_used).  FER with a Wilson CI is recorded per cell.

Output: artifacts/registry_tpu_validation.csv, one row per cell,
written incrementally (the TPU tunnel dies for hours at a time — a
partial run keeps its finished rows and the script resumes: cells
already present in the CSV are skipped).

Run: PYTHONPATH inherited (repo cwd), real TPU required:
    timeout 3600 python scripts/registry_tpu_validation.py
"""

import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "registry_tpu_validation.csv")

# Eb/N0 per rate: near the min-sum-50 FER~1e-2 operating point for the
# mid lifts (family tables, BASELINE.md) so the FER column is a
# meaningful waterfall-region number, not 0-of-N.
EBN0_BY_RATE = {"1/2": 1.8, "2/3": 2.4, "3/4": 2.8, "5/6": 3.6}

BATCH = 512
ITERS = 50
ALPHA = 0.75

FIELDS = ["cell", "n", "k", "Z", "rate", "ebn0_db", "frames", "fer",
          "fer_lo", "fer_hi", "bitexact", "mean_iters", "wall_ms_incl_compile", "ts"]


def cells():
    yield ("judged", None, None, None, "1/2")
    for fam, lifts in (("wifi", (27, 54, 81)), ("wimax", (24, 48, 96))):
        for rate in ("1/2", "2/3", "3/4", "5/6"):
            for z in lifts:
                yield (f"{fam}_r{rate.replace('/', '')}_z{z}",
                       fam, rate, z, rate)


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ldpc._native import minsum_decode
    from tpu_ldpc.channel import noise_sigma2
    from tpu_ldpc.codes import LdpcCode
    from tpu_ldpc.decode.pallas_bp import build_pallas_decoder
    from tpu_ldpc.golden import encode as golden_encode
    from tpu_ldpc.report.waterfall import wilson_interval

    assert jax.default_backend() == "tpu", jax.default_backend()

    # Resume (review r3 fixes): only bitexact=True cells are skipped —
    # a recorded FAILURE is re-validated, never silently dropped from
    # the exit status; header presence is judged by file size, not by
    # row count (a header-only crash must not append a second header).
    done = set()
    n_fail = 0
    if os.path.exists(OUT):
        with open(OUT) as f:
            for r in csv.DictReader(f):
                if r["bitexact"] == "True":
                    done.add(r["cell"])
    new_file = not os.path.exists(OUT) or os.path.getsize(OUT) == 0
    fout = open(OUT, "a", newline="")
    w = csv.DictWriter(fout, fieldnames=FIELDS)
    if new_file:
        w.writeheader()
    for cell, fam, rate, z, rate_str in cells():
        if cell in done:
            print(f"{cell}: already validated, skip", flush=True)
            continue
        code = (LdpcCode.judged() if fam is None
                else LdpcCode.from_family(fam, rate, z))
        ebn0 = EBN0_BY_RATE[rate_str] if fam is None else EBN0_BY_RATE[rate]
        # paired seed: one fixed stream per cell name (crc32 is
        # deterministic across processes, unlike str hash)
        import zlib

        rng = np.random.default_rng(zlib.crc32(cell.encode()))
        sigma2 = noise_sigma2(ebn0, code.rate)
        u = rng.integers(0, 2, (BATCH, code.k)).astype(np.uint8)
        c = golden_encode(code.H, u)
        x = 1.0 - 2.0 * c.astype(np.float64)
        llr = ((2.0 / sigma2) * (x + np.sqrt(sigma2)
               * rng.normal(size=x.shape))).astype(np.float32)

        dec = build_pallas_decoder(code, algo="minsum", iters=ITERS,
                                   alpha=ALPHA, early_stop=True)
        t0 = time.perf_counter()
        tb, tok, tiu = map(np.asarray, jax.block_until_ready(
            dec(jnp.asarray(llr))))
        # host-side wall time incl. compile and dispatch RTT — a provenance
        # record ONLY, never a throughput number (CLAUDE.md: host-side
        # per-call TPU timing is meaningless here; bench.py is the timer)
        wall_ms = (time.perf_counter() - t0) * 1e3
        nb_, nok, niu = minsum_decode(code.H, llr, iters=ITERS, alpha=ALPHA)

        bitexact = (np.array_equal(tb, nb_) and np.array_equal(tok, nok)
                    and np.array_equal(tiu, niu))
        fe = int((tb[:, :code.k] != u).any(axis=1).sum())
        lo, hi = wilson_interval(fe, BATCH)
        row = dict(cell=cell, n=code.n, k=code.k, Z=code.Z, rate=rate_str,
                   ebn0_db=ebn0, frames=BATCH, fer=round(fe / BATCH, 6),
                   fer_lo=round(lo, 6), fer_hi=round(hi, 6),
                   bitexact=bitexact, mean_iters=round(float(tiu.mean()), 2),
                   wall_ms_incl_compile=round(wall_ms, 1),
                   ts=time.strftime("%Y-%m-%d %H:%M"))
        w.writerow(row)
        fout.flush()
        n_fail += not bitexact
        print(f"{cell}: bitexact={bitexact} fer={fe}/{BATCH} "
              f"[{lo:.4g},{hi:.4g}] mean_iters={row['mean_iters']}",
              flush=True)

    fout.close()
    print(f"DONE n_fail={n_fail}", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
