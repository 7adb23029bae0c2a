"""Distributed execution: device meshes, SPMD MC steps, psum counters (L4)."""

from tpu_ldpc.dist.mesh import (  # noqa: F401
    build_sharded_mc_step,
    fold_key_device,
    init_distributed,
    make_mesh,
    run_ber_sharded,
)
