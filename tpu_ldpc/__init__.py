"""tpu-ldpc: a TPU-native QC-LDPC coding framework.

Brand-new design (not a port) matching the capability surface of the
C++ reference library `eovs/ldpc-lib` (see SURVEY.md; the reference
mount is empty, so parity is anchored to BASELINE.json's five configs):

- QC-LDPC code construction: base-graph registry, circulant lifting,
  girth-aware shift selection (``tpu_ldpc.codes``).
- Encoding: dual-diagonal back-substitution and dense-generator
  MXU matmul paths (``tpu_ldpc.encode``).
- Decoding: sum-product and normalized/offset min-sum with flooding and
  layered schedules and syndrome-checked early termination, as fused
  Pallas TPU kernels plus a pure-jnp reference path (``tpu_ldpc.decode``).
- BPSK/AWGN Monte-Carlo BER/FER harness (``tpu_ldpc.sim``), sharded over
  multi-host TPU meshes with psum-reduced counters (``tpu_ldpc.dist``).
- float64/float32 NumPy golden model used as ground truth by all tests
  (``tpu_ldpc.golden``).
"""

__version__ = "0.1.0"

from tpu_ldpc.codes.code import LdpcCode  # noqa: F401
