"""Multi-process DP scaling of the sharded MC step (SURVEY.md §6 row 2;
VERDICT r1 missing #1 / next-#6).

Launches N localhost processes (1 virtual CPU device each) joined by
jax.distributed into one global 'mc' mesh, runs a fixed number of
sharded MC steps of the judged code, and reports aggregate frames/s.
This measures the DP path end to end (per-device PRNG folding, sharded
decode, cross-process psum of counters) — the achievable proxy for pod
scaling in a TPU-less environment.

Caveats recorded with the numbers: the box has few physical cores and
XLA-CPU already multithreads inside one process, so process-scaling
saturates at the core count; the interesting signals are (a) efficiency
at N <= cores and (b) that the psum'd counter totals stay identical to
the single-process run (checked here via the replicated counters).

Usage:  python scripts/scaling_bench.py            # parent, runs the sweep
        python scripts/scaling_bench.py worker ... # internal
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(port: str, pid: int, nprocs: int, steps: int, batch: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np

    from tpu_ldpc.codes import LdpcCode
    from tpu_ldpc.dist.mesh import build_sharded_mc_step, make_mesh
    from tpu_ldpc.sim.mc import DecodeCfg

    code = LdpcCode.judged()
    mesh = make_mesh(jax.devices())
    cfg = DecodeCfg(algo="minsum", iters=50, impl="jnp")
    step = build_sharded_mc_step(code, cfg, batch, mesh)

    def run(ctr):
        return np.asarray(jax.device_get(step(
            jnp.asarray([3], jnp.int32),
            jnp.asarray([0], jnp.int32),
            jnp.asarray([2.0], jnp.float32),
            jnp.asarray([ctr], jnp.int32),
        )))

    run(0)  # compile + warmup
    t0 = time.perf_counter()
    tot = None
    for s in range(1, steps + 1):
        c = run(s)
        tot = c if tot is None else tot + c
    dt = time.perf_counter() - t0
    frames = int(tot[0])
    if pid == 0:
        print(json.dumps({
            "n_procs": nprocs, "steps": steps, "batch_per_device": batch,
            "frames": frames, "wall_s": round(dt, 3),
            "frames_per_s": round(frames / dt, 1),
            "counters": [int(x) for x in tot],
        }), flush=True)
    jax.distributed.shutdown()


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    # >=5 s of measured work per point so dispatch/startup is <5% of
    # wall (VERDICT r2 #6: the old 4x64 run was 0.63 s at N=2 and
    # under-reported the DP path).  N is capped at 2 — this box has 2
    # cores, and one pinned core per worker is the whole point; on a
    # bigger box raise the cap only up to the PHYSICAL core count
    # (os.cpu_count() reports logical CPUs: with SMT, naive pid %
    # cpu_count pinning can land two workers on hyperthread siblings
    # and measure SMT contention instead of DP overhead).
    steps, batch = 12, 256
    results = []
    max_n = min(2, os.cpu_count() or 1)
    for n in sorted({1, max_n}):
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        # pin each worker to its own physical core (taskset): without
        # pinning, XLA-CPU's intra-op threading lets the N=1 process use
        # every core, so N=2 measures thread contention (58% "efficiency"
        # on a 2-core box), not DP scaling.  Pinned, each process has
        # exactly one core at every N and the ratio isolates the DP
        # path's own overhead (psum + per-step dispatch).
        procs = [
            subprocess.Popen(
                ["taskset", "-c", str(pid % (os.cpu_count() or 1)),
                 sys.executable, os.path.abspath(__file__), "worker",
                 str(port), str(pid), str(n), str(steps), str(batch)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                env=env, cwd=REPO,
            )
            for pid in range(n)
        ]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            if p.returncode != 0:
                sys.exit(f"worker rc={p.returncode}:\n{err.decode()[-2000:]}")
            outs.append(out.decode())
        rec = json.loads(
            [ln for ln in "".join(outs).splitlines()
             if ln.startswith("{")][0]
        )
        base = results[0]["frames_per_s"] if results else rec["frames_per_s"]
        rec["efficiency_vs_1proc"] = round(
            rec["frames_per_s"] / (rec["n_procs"] * base), 3
        )
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open(os.path.join(REPO, "artifacts", "scaling_multiproc.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
               int(sys.argv[5]), int(sys.argv[6]))
    else:
        main()
