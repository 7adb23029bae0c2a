"""Golden NumPy hard-decision decoders: bit-flipping family.

Ground truth for the jnp hard decoders (decode/hard.py), mirroring the
BP golden contract (golden/decoder.py): identical update order and
dtypes so comparisons are bit-exact, and the same early-termination
accounting (syndrome checked at iteration 0 on the raw hard decision;
converged codewords freeze; iters_used = first clean iteration).

Algorithms:
  * ``bitflip`` — parallel majority bit-flipping (Gallager-style): per
    iteration compute the syndrome, count each variable's unsatisfied
    incident checks u_j, flip every bit with 2*u_j > degree_j (strict
    majority).  Pure integer arithmetic: trivially exact.
  * ``wbf`` — weighted bit-flipping (Kou/Lin/Fossorier form): check m
    carries reliability w_m = min_{n in N(m)} |llr_n|; per iteration
    flip the single bit maximizing E_n = sum_{m in N(n)} (2 s_m - 1)
    w_m.  Weights/energies are computed in float32 with sequential
    edge-order min and ascending-row accumulation so the jnp decoder
    reproduces them bit-for-bit (first-occurrence argmax ties).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _structure(H):
    Hc = sp.coo_matrix(H)
    order = np.lexsort((Hc.col, Hc.row))
    rows = Hc.row[order].astype(np.int64)
    cols = Hc.col[order].astype(np.int64)
    m, n = Hc.shape
    row_edges = [[] for _ in range(m)]
    col_edges = [[] for _ in range(n)]
    for e, (i, j) in enumerate(zip(rows, cols)):
        row_edges[i].append(e)
        col_edges[j].append(e)
    return rows, cols, row_edges, col_edges, m, n


def decode_hard(H, llr, algo: str = "bitflip", iters: int = 50):
    """Hard-decision decode.  llr (batch, n) -> (bits, ok, iters_used).

    Same output contract as golden.decode: bits uint8, ok bool
    (syndrome satisfied), iters_used int32 with sequential
    early-termination semantics.
    """
    if algo not in ("bitflip", "wbf"):
        raise ValueError(f"unknown hard algo {algo!r}")
    llr = np.asarray(llr, dtype=np.float32)
    batch, n = llr.shape
    rows, cols, row_edges, col_edges, m, n_ = _structure(H)
    assert n_ == n
    Hs = sp.csr_matrix(H).astype(np.int64)
    deg = np.asarray(Hs.sum(axis=0)).ravel()  # (n,) column degrees

    x = (llr < 0).astype(np.int64)            # (batch, n)
    mag = np.abs(llr)                          # float32

    def syndrome(xb):
        return np.asarray((xb @ Hs.T) % 2)     # (batch, m)

    s = syndrome(x)
    done = ~s.any(axis=1)
    iters_used = np.where(done, 0, iters).astype(np.int32)

    for it in range(1, iters + 1):
        if done.all():
            break
        if algo == "bitflip":
            u = s @ np.asarray(Hs.todense())   # (batch, n) unsat counts
            flip = (2 * u > deg[None, :]).astype(np.int64)
        else:  # wbf: flip the single argmax-energy bit per codeword
            # check reliability: sequential edge-order min (fp32)
            w = np.full((batch, m), np.float32(np.inf), dtype=np.float32)
            for i in range(m):
                for e in row_edges[i]:
                    w[:, i] = np.minimum(w[:, i], mag[:, cols[e]])
            E = np.zeros((batch, n), dtype=np.float32)
            for j in range(n):
                for e in col_edges[j]:  # ascending row order
                    i = rows[e]
                    E[:, j] = E[:, j] + (2 * s[:, i] - 1).astype(
                        np.float32
                    ) * w[:, i]
            jstar = np.argmax(E, axis=1)       # first-occurrence ties
            flip = np.zeros_like(x)
            flip[np.arange(batch), jstar] = 1
        x = np.where(done[:, None], x, x ^ flip)
        s = syndrome(x)
        ok_now = ~s.any(axis=1)
        newly = ok_now & ~done
        iters_used[newly] = it
        done = done | ok_now

    return x.astype(np.uint8), done, iters_used
