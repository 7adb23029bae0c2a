"""Golden NumPy belief-propagation decoders.

This module is the ground truth for the whole framework (SURVEY.md C16):
an explicit, slow, trustworthy implementation of sum-product and
normalized/offset min-sum decoding with true sequential early-termination
semantics.  Every device decoder (jnp reference, Pallas kernels) is tested
against it — for min-sum with ``dtype=np.float32`` the comparison is
*bit-exact* because the arithmetic contract below is followed by every
implementation:

Arithmetic contract (shared by golden / jnp / Pallas decoders):
  * VN posterior:  P[j] = L[j] + sum of incident CN->VN messages R,
    accumulated sequentially in **increasing row order** (for a QC code
    this equals increasing block-row order).
  * VN->CN message: Q[i,j] = P[j] - R[i,j]   (subtract-extrinsic form).
  * Min-sum CN update: two-min + sign product over the row, then
    R_new = alpha * max(min_excl - beta, 0) * sign_excl.
    min/compare/multiply are exact in fp32 given identical inputs.
  * Hard decision: bit = 1 iff P < 0  (ties decode to 0).
  * Early termination: syndrome H@hard(P) checked on the channel LLRs
    (iteration 0) and after every full iteration; a converged codeword's
    messages and posterior freeze; iters_used records the first iteration
    index at which the syndrome was zero (0 if the raw channel decision
    already satisfies H, ``iters`` if never).

Sum-product uses the stable sign/log-magnitude form with the same
clipping constants as the device decoders (compare with fp tolerance,
not bit-exactness).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

# Sum-product stability clips, shared verbatim with the device decoders.
SP_MIN_MAG = 1e-9     # lower clip on |Q| before phi()
SP_MAX_MAG = 30.0     # upper clip on |Q|; tanh(15) saturates fp32 anyway
MSG_CLIP = 1e9        # generic overflow guard (no-op in practice)


def _phi(x: np.ndarray) -> np.ndarray:
    """phi(x) = -log(tanh(x/2)), self-inverse on (0, inf)."""
    x = np.clip(x, SP_MIN_MAG, SP_MAX_MAG)
    return -np.log(np.tanh(x / 2.0))


def _edges_of(H) -> tuple[np.ndarray, np.ndarray]:
    """Return (rows, cols) of H's nonzeros sorted by (row, col)."""
    Hc = sp.coo_matrix(H)
    order = np.lexsort((Hc.col, Hc.row))
    return Hc.row[order].astype(np.int64), Hc.col[order].astype(np.int64)


def syndrome_ok(H, bits: np.ndarray) -> np.ndarray:
    """H @ bits^T == 0 per codeword. bits: (batch, n) in {0,1}."""
    Hcsr = sp.csr_matrix(H).astype(np.int64)
    syn = np.asarray((Hcsr @ bits.T) % 2)
    return ~np.any(syn, axis=0)


def decode(
    H,
    llr: np.ndarray,
    algo: str = "minsum",
    iters: int = 50,
    alpha: float = 0.75,
    beta: float = 0.0,
    schedule: str = "flooding",
    dtype=np.float64,
    early_stop: bool = True,
):
    """Decode a batch of LLR vectors with the golden BP decoder.

    Args:
      H: (m, n) parity-check matrix (scipy sparse or dense 0/1).
      llr: (batch, n) channel LLRs, positive means bit 0 more likely.
      algo: 'minsum' (normalized/offset) or 'sumproduct'.
      iters: max iterations.
      alpha, beta: min-sum normalization / offset (alpha=1, beta=0 => plain).
      schedule: 'flooding' or 'layered' (row-layered, rows in ascending order).
      dtype: working precision (float64 default; float32 for bit-exact
        comparison against device kernels).
      early_stop: freeze converged codewords (sequential semantics).

    Returns:
      bits: (batch, n) uint8 hard decisions.
      ok: (batch,) bool, syndrome satisfied.
      iters_used: (batch,) int32 per the module-docstring contract.
    """
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule {schedule!r}")
    if algo not in ("minsum", "sumproduct"):
        raise ValueError(f"unknown algo {algo!r}")
    llr = np.asarray(llr, dtype=dtype)
    if llr.ndim == 1:
        llr = llr[None, :]
    batch, n = llr.shape
    rows, cols = _edges_of(H)
    m = sp.csr_matrix(H).shape[0]
    n_edges = len(rows)

    # Per-row and per-col edge index lists (edges sorted by (row, col)).
    row_edges = [np.nonzero(rows == i)[0] for i in range(m)]
    # col_edges[j] is automatically in increasing row order because edges
    # are sorted by (row, col) and we select a fixed col.
    col_edges = [np.nonzero(cols == j)[0] for j in range(n)]

    bits_out = np.zeros((batch, n), dtype=np.uint8)
    ok_out = np.zeros(batch, dtype=bool)
    iters_out = np.full(batch, iters, dtype=np.int32)

    alpha = dtype(alpha)
    beta = dtype(beta)

    for b in range(batch):
        L = llr[b]
        R = np.zeros(n_edges, dtype=dtype)  # CN->VN messages
        P = L.copy()                        # posterior

        def hard(p):
            return (p < 0).astype(np.uint8)

        def syn_ok(p):
            bits = hard(p)
            for i in range(m):
                if int(np.sum(bits[cols[row_edges[i]]])) % 2 != 0:
                    return False
            return True

        # Iteration-0 check on the raw channel decision.
        if early_stop and syn_ok(P):
            bits_out[b] = hard(P)
            ok_out[b] = True
            iters_out[b] = 0
            continue

        converged = False
        for it in range(1, iters + 1):
            if schedule == "flooding":
                # CN pass from Q = P - R (P from previous iteration).
                Q = P[cols] - R
                for i in range(m):
                    e = row_edges[i]
                    R[e] = _cn_update(Q[e], algo, alpha, beta, dtype)
                # VN pass: sequential accumulation in increasing row order.
                for j in range(n):
                    p = L[j]
                    for e in col_edges[j]:
                        p = p + R[e]
                    P[j] = p
            else:  # layered: rows updated sequentially, posterior in place
                for i in range(m):
                    e = row_edges[i]
                    q = P[cols[e]] - R[e]
                    r_new = _cn_update(q, algo, alpha, beta, dtype)
                    P[cols[e]] = q + r_new
                    R[e] = r_new
            if early_stop and syn_ok(P):
                bits_out[b] = hard(P)
                ok_out[b] = True
                iters_out[b] = it
                converged = True
                break
        if not converged:
            bits_out[b] = hard(P)
            ok_out[b] = bool(syn_ok(P)) if not early_stop else False
            iters_out[b] = iters
            if not early_stop:
                # without early stop we still report final syndrome status
                ok_out[b] = syn_ok(P)
    return bits_out, ok_out, iters_out


def _cn_update(q: np.ndarray, algo: str, alpha, beta, dtype) -> np.ndarray:
    """Extrinsic CN->VN messages for one check row. q: (deg,)."""
    sign = np.where(q < 0, dtype(-1.0), dtype(1.0))
    mag = np.abs(q)
    total_sign = np.prod(sign)
    if algo == "minsum":
        # two-min trick, exact arithmetic
        order = np.argsort(mag, kind="stable")
        min1_idx = order[0]
        min1 = mag[min1_idx]
        min2 = mag[order[1]] if len(mag) > 1 else min1
        mag_excl = np.where(np.arange(len(mag)) == min1_idx, min2, min1)
        mag_excl = np.maximum(mag_excl - beta, dtype(0.0))
        out = alpha * mag_excl
    else:  # sumproduct, stable phi form
        ph = _phi(mag.astype(np.float64)).astype(dtype)
        tot = np.sum(ph)
        out = _phi((tot - ph).astype(np.float64)).astype(dtype)
    return (total_sign * sign) * out
