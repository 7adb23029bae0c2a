"""`python -m tpu_ldpc.cli.bench` — judge-metric throughput (SURVEY.md C13).

Measures decoded info bits/s/chip (call stack §3.5) with the on-device
fori_loop method shared with bench.py: fresh keyed LLR generation per
inner step, generation-only loop subtracted (the only measured-reliable
pattern here — see BASELINE.md's measurement-method findings).
Reports single-chip and, when more devices are visible, mesh-sharded
scaling.  `--profile DIR` wraps the timed loop in a jax.profiler trace.
"""

from __future__ import annotations

import argparse
import json


def bench_decode(
    code,
    batch: int = 4096,
    iters: int = 50,
    algo: str = "minsum",
    alpha: float = 0.75,
    schedule: str = "flooding",
    early_stop: bool = False,
    ebn0_db: float = 2.0,
    reps: int = 30,
    impl: str = "auto",
    phase1_iters: int | None = None,
    compact_budget: int | None = None,
):
    """Time the decode path; returns (seconds/batch, info bits/s)."""
    import jax

    from tpu_ldpc.benchcore import make_timer

    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu"
    )
    if impl == "twophase":
        # two-phase straggler-compaction ET (DESIGN.md §3.5): the
        # champion operating point; early_stop is implied.  Unset knobs
        # resolve from the cell's registry metadata (decode/knobs.py);
        # warn_on_fallback stays OFF here — a debug callback inside the
        # device timing loop would serialize dispatches and corrupt the
        # measurement (fallback is visible in the number itself).
        from tpu_ldpc.decode.knobs import resolve_twophase_knobs
        from tpu_ldpc.decode.twophase import build_twophase_decoder

        k, b, _src = resolve_twophase_knobs(
            code, schedule, phase1_iters, compact_budget)
        fn = build_twophase_decoder(
            code, iters=iters, phase1_iters=k,
            budget=b, algo=algo, alpha=alpha,
            schedule=schedule,
        )
    elif use_pallas:
        from tpu_ldpc.decode.pallas_bp import build_pallas_decoder

        fn = build_pallas_decoder(
            code, algo=algo, iters=iters, alpha=alpha,
            schedule=schedule, early_stop=early_stop,
        )
    else:
        from tpu_ldpc.decode.reference import build_decoder

        fn = build_decoder(
            code, algo=algo, iters=iters, alpha=alpha,
            schedule=schedule, early_stop=early_stop,
        )

    # Shared estimator (tpu_ldpc/benchcore.py): on-device fori_loop over
    # fresh per-step inputs, matched generation-only loop subtracted,
    # interleaved reps, median of paired deltas — the only pattern
    # measured to defeat both failure modes of this environment (the
    # ~25 ms host dispatch round trip and the remote runtime's
    # computation cache on recurring large input buffers).
    # inner=60 on the remote TPU: the dispatch-RTT jitter share of the
    # paired delta drops from ~15% to ~1-2% (BASELINE.md r2 session);
    # on CPU keep the loop short — the decode itself is the cost there.
    inner = (60 if jax.default_backend() == "tpu"
             else max(2, min(reps, 8)))
    timer, _u = make_timer(code, batch, ebn0_db=ebn0_db, inner=inner)
    dt = timer.measure(fn, reps=5)["median_s"]
    if dt <= 0:
        # below estimator resolution (documented small-batch regime,
        # BASELINE.md): the paired-delta jitter exceeds the decode
        # itself.  Refuse to print a nonsense number.
        import sys

        print(
            f"warning: measured delta {dt*1e3:.4f} ms/batch is not "
            "positive — decode is below the estimator's resolution at "
            f"batch={batch}, iters given; use a larger batch/iters "
            "(>=2k codewords is the trustworthy regime)",
            file=sys.stderr,
        )
        return float("nan"), float("nan")
    return dt, batch * code.k / dt


def main(argv=None):
    p = argparse.ArgumentParser(description="tpu-ldpc throughput benchmark")
    p.add_argument("--family", default="judged")
    p.add_argument("--rate", default="1/2")
    p.add_argument("--z", type=int, default=64)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--iters", type=int, default=None,
                   help="iteration budget (default: the cell's tuned "
                        "registry metadata value for impl=twophase — "
                        "the (K, budget) knobs were tuned AT that "
                        "total-iters; else 50)")
    p.add_argument("--algo", default="minsum")
    p.add_argument("--schedule", default="flooding")
    p.add_argument("--early-stop", action="store_true")
    p.add_argument("--ebn0", type=float, default=None,
                   help="operating point (default: the cell's tuned "
                        "registry metadata point for impl=twophase, "
                        "else 2.0 — a rate-5/6 cell at 2.0 dB is all "
                        "stragglers and pays the fallback every "
                        "dispatch)")
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--impl", default="auto",
                   choices=["auto", "jnp", "pallas", "twophase"])
    p.add_argument("--phase1-iters", type=int, default=None,
                   help="impl=twophase: phase-1 iteration budget "
                        "(default: per-cell registry metadata)")
    p.add_argument("--compact-budget", type=int, default=None,
                   help="impl=twophase: phase-2 compacted batch size "
                        "(default: per-cell registry metadata)")
    p.add_argument("--profile", metavar="DIR")
    p.add_argument("--json", action="store_true", help="machine output")
    args = p.parse_args(argv)

    import jax

    from tpu_ldpc.cli.config import CodeSpec

    code = CodeSpec(family=args.family, rate=args.rate, Z=args.z).build()

    if args.ebn0 is None or args.iters is None:
        # the metadata operating point applies ONLY to impl=twophase
        # (its knobs were tuned at that point and overflow elsewhere);
        # every other impl keeps the documented defaults so numbers
        # stay comparable with prior captures (review r4).  iters too
        # (ADVICE r4): layered metadata is tuned at iters=25 — a
        # default of 50 would halve the recorded gbps despite
        # defaulting ebn0 from the same entry.
        entry = None
        if args.impl == "twophase":
            from tpu_ldpc.decode.knobs import registry_entry

            entry = registry_entry(code, args.schedule)
        if args.ebn0 is None:
            args.ebn0 = (entry or {}).get("ebn0_db", 2.0)
        if args.iters is None:
            args.iters = (entry or {}).get("iters", 50)

    ctx = None
    if args.profile:
        ctx = jax.profiler.trace(args.profile)
        ctx.__enter__()
    dt, thpt = bench_decode(
        code, batch=args.batch, iters=args.iters, algo=args.algo,
        schedule=args.schedule, early_stop=args.early_stop,
        ebn0_db=args.ebn0, reps=args.reps, impl=args.impl,
        phase1_iters=args.phase1_iters, compact_budget=args.compact_budget,
    )
    if ctx is not None:
        ctx.__exit__(None, None, None)

    rec = {
        "code": code.name, "n": code.n, "k": code.k, "ebn0_db": args.ebn0,
        "algo": args.algo, "iters": args.iters, "schedule": args.schedule,
        "early_stop": args.early_stop, "batch": args.batch,
        "backend": jax.default_backend(), "n_devices": jax.device_count(),
        "ms_per_batch": dt * 1e3, "info_bits_per_s": thpt,
        "gbps": thpt / 1e9,
    }
    if args.json:
        # strict JSON: the below-resolution guard returns NaN, which
        # json.dumps would serialize as a bare `NaN` literal that
        # breaks downstream parsers (ADVICE r2) — emit null instead
        import math

        safe = {
            k: (None if isinstance(v, float) and not math.isfinite(v)
                else v)
            for k, v in rec.items()
        }
        print(json.dumps(safe))
    else:
        print(
            f"{code.name}: {args.algo} {args.iters} iters "
            f"({args.schedule}, early_stop={args.early_stop}) "
            f"batch={args.batch} on {rec['backend']}: "
            f"{dt*1e3:.2f} ms/batch -> {thpt/1e9:.3f} Gb/s info"
        )
    return rec


if __name__ == "__main__":
    main()
