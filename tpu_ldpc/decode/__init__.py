"""Decoders: jnp reference + fused Pallas kernels (L2)."""

from tpu_ldpc.decode.api import build_decode_fn, decode  # noqa: F401
