"""Worker for the multi-process jax.distributed smoke test.

Launched twice by tests/test_multiprocess.py:
    python multiproc_worker.py <coordinator_port> <process_id> <num_procs>

Each process contributes 2 virtual CPU devices; the global 'mc' mesh
spans both processes, and the psum'd counters must come out identical
on every process (printed for the parent to compare).
"""

import os
import sys


def main():
    port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 2 * nprocs  # global devices
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp
    import numpy as np

    from tpu_ldpc.codes import LdpcCode, make_base_graph
    from tpu_ldpc.dist.mesh import build_sharded_mc_step, make_mesh
    from tpu_ldpc.sim.mc import DecodeCfg

    code = LdpcCode.from_base_graph(make_base_graph(4, 8, 4, seed=7), 4, "toy")
    mesh = make_mesh(jax.devices())  # global mesh across processes
    cfg = DecodeCfg(algo="minsum", iters=10, impl="jnp")
    step = build_sharded_mc_step(code, cfg, 8, mesh)
    counters = np.asarray(jax.device_get(step(
        jnp.asarray([3], jnp.int32),
        jnp.asarray([0], jnp.int32),
        jnp.asarray([4.0], jnp.float32),
        jnp.asarray([0], jnp.int32),
    )))
    # replicated counters: identical on every process
    print(f"COUNTERS {pid} {' '.join(map(str, counters.tolist()))}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
