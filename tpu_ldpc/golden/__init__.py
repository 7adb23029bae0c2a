"""Golden NumPy reference models (ground truth for all tests)."""

from tpu_ldpc.golden.decoder import decode, syndrome_ok  # noqa: F401
from tpu_ldpc.golden.encoder import (  # noqa: F401
    encode,
    gf2_inv,
    gf2_rank,
    gf2_row_reduce,
    parity_map,
)
