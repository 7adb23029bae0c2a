"""Fused Pallas BP decoder kernels — the flagship hot core (SURVEY.md C6-C9,
call stack §3.2).

Design (TPU-first, not a translation of any CPU/CUDA loop):

  * One `pallas_call` decodes a whole batch tile for all iterations:
    messages never touch HBM mid-decode (the §6 roofline shows
    HBM-resident messages cap well under the target; VMEM-residency is
    the design).
  * Lane axis = codeword batch (B_tile lanes), sublane axis = the lift
    dimension Z.  All per-block tensors are (Z, B_tile) VPU tiles.
  * Circulant gathers/scatters are static sublane rolls: variable->check
    coordinates is roll(v, -s), check->variable is roll(r, +s) — no
    gather/scatter ops anywhere.  (Measured on v5e: a pipelined sublane
    roll costs about one VPU add.)
  * The base-graph structure is baked in at trace time from the
    TannerLayout (static unroll over nonzero blocks); kernels never see
    construction logic, only the layout contract.
  * CN->VN messages R live in *check coordinates* in a VMEM scratch of
    shape (E, Z, B_tile); posterior P and channel L are (nb, Z, B_tile).
  * The syndrome check is fused into the CN pass: the rolled posterior
    t = roll(P_j, -s) is both the syndrome operand and the minuend of
    q = t - R, so early-termination checking costs no extra memory pass.
    Iteration `it` detects convergence of the posterior produced by
    iteration it-1 (it=1 checks the raw channel decision).
  * Min-sum CN update is branchless sign-magnitude arithmetic:
    magnitudes via abs, the exclusive minimum via prefix/suffix min
    trees (exactly equal to the golden two-min semantics, ties
    included), signs as int32 sign bits combined with XOR trees and
    re-attached with OR.  All of it bit-exact vs the golden fp32 model.
  * Early termination (C9): per-lane done mask; converged lanes latch
    their *hard decisions* into an int8 output (cheaper than latching
    the posterior, and equivalent to freezing since lanes are
    independent); iters_used matches the golden sequential semantics
    exactly.  The all-done exit is checked every `exit_block` iterations
    (scalar reductions stall the vector pipeline, so the guard runs at
    block granularity while bookkeeping stays per-iteration).

The same generator emits sum-product (stable sign/phi form) and the
row-layered schedule (sequential block-row sweeps inside the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ldpc.codes.code import LdpcCode
from tpu_ldpc.golden.decoder import SP_MAX_MAG, SP_MIN_MAG

DEFAULT_BATCH_TILE = 128
VMEM_BUDGET_BYTES = int(11.5 * 1024 * 1024)
SIGN_MASK = np.int32(np.uint32(0x80000000))


def _roll_to_check(x, s: int, Z: int):
    """variable -> check coordinates: out[r] = x[(r + s) % Z]."""
    s = s % Z
    if s == 0:
        return x
    return pltpu.roll(x, Z - s, axis=0)


def _roll_to_var(x, s: int, Z: int):
    """check -> variable coordinates: out[v] = x[(v - s) % Z]."""
    s = s % Z
    if s == 0:
        return x
    return pltpu.roll(x, s, axis=0)


def _xor_tree(vals):
    """Balanced XOR tree (exact in any order)."""
    vals = list(vals)
    while len(vals) > 1:
        nxt = [a ^ b for a, b in zip(vals[::2], vals[1::2])]
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
    return vals[0]


def _prefix_suffix_excl_min(mags):
    """excl[e] = min over mags of the other edges (== golden two-min
    semantics for every tie pattern).  Log-depth dependency chains."""
    d = len(mags)
    if d == 1:
        return [mags[0]]  # degree-1 row sends its own magnitude (golden)
    pre = [None] * d  # pre[e] = min(mags[0..e-1])
    suf = [None] * d  # suf[e] = min(mags[e+1..])
    pre[1] = mags[0]
    for e in range(2, d):
        pre[e] = jnp.minimum(pre[e - 1], mags[e - 1])
    suf[d - 2] = mags[d - 1]
    for e in range(d - 3, -1, -1):
        suf[e] = jnp.minimum(suf[e + 1], mags[e + 1])
    out = [suf[0]] + [
        jnp.minimum(pre[e], suf[e]) for e in range(1, d - 1)
    ] + [pre[d - 1]]
    return out


def _normalize_offsets(lay):
    """Per-block-row / per-block-column coordinate rotations (d, c)
    maximizing the number of edges whose *effective* circulant shift
    (s_e + d_i - c_j) % Z is zero — those edges need NO sublane roll in
    either the CN gather or the VN scatter (2 fewer VPU ops per edge per
    iteration; the §6 roofline shows the kernel is VPU-issue-bound).

    On any Tanner cycle the alternating shift sum is a rotation
    invariant, so in general at most a spanning tree's worth of edges
    (mb + nb - 1) can be zeroed.  Search: random spanning-tree starts +
    coordinate ascent (each node update is exact for its incident
    edges, so the zero count is monotone), with the identity start
    included — the result is never worse than the unnormalized layout
    (which matters for dual-diagonal bases that already carry many
    zero shifts).

    This is pure coordinate relabeling: the kernel pre-rotates the
    channel LLRs per column on entry and un-rotates the hard bits on
    exit, so decode outputs are bit-exact vs the unnormalized kernel.
    """
    Z, mb, nb, E = lay.Z, lay.mb, lay.nb, lay.E
    er = np.asarray(lay.edge_row, dtype=np.int64)
    ec = np.asarray(lay.edge_col, dtype=np.int64)
    es = np.asarray(lay.edge_shift, dtype=np.int64)
    rows_of = [np.nonzero(er == i)[0] for i in range(mb)]
    cols_of = [np.nonzero(ec == j)[0] for j in range(nb)]

    def zeros(d, c):
        return int(np.sum((es + d[er] - c[ec]) % Z == 0))

    def ascend(d, c):
        for _ in range(64):
            changed = False
            for i in range(mb):
                edges = rows_of[i]
                if len(edges) == 0:
                    continue
                cand = (c[ec[edges]] - es[edges]) % Z
                vals, cnt = np.unique(cand, return_counts=True)
                best = set(vals[cnt == cnt.max()])
                if d[i] not in best:
                    d[i] = int(min(best))
                    changed = True
            for j in range(nb):
                edges = cols_of[j]
                if len(edges) == 0:
                    continue
                cand = (es[edges] + d[er[edges]]) % Z
                vals, cnt = np.unique(cand, return_counts=True)
                best = set(vals[cnt == cnt.max()])
                if c[j] not in best:
                    c[j] = int(min(best))
                    changed = True
            if not changed:
                break
        return d, c

    def tree_start(rng):
        d = np.zeros(mb, np.int64)
        c = np.zeros(nb, np.int64)
        seen_r = np.zeros(mb, bool)
        seen_c = np.zeros(nb, bool)
        # DFS over the bipartite base graph with randomized edge order;
        # tree edges get effective shift 0 by construction
        adj_r = [rng.permutation(rows_of[i]) for i in range(mb)]
        adj_c = [rng.permutation(cols_of[j]) for j in range(nb)]
        for root in range(mb):
            if seen_r[root]:
                continue
            seen_r[root] = True
            stack = [("r", root)]
            while stack:
                kind, u = stack.pop()
                if kind == "r":
                    for e in adj_r[u]:
                        j = ec[e]
                        if not seen_c[j]:
                            seen_c[j] = True
                            c[j] = (d[u] + es[e]) % Z
                            stack.append(("c", j))
                else:
                    for e in adj_c[u]:
                        i = er[e]
                        if not seen_r[i]:
                            seen_r[i] = True
                            d[i] = (c[u] - es[e]) % Z
                            stack.append(("r", i))
        return d, c

    rng = np.random.default_rng(0)
    best_d, best_c = ascend(np.zeros(mb, np.int64), np.zeros(nb, np.int64))
    best_z = zeros(best_d, best_c)
    for _ in range(12):
        d, c = ascend(*tree_start(rng))
        z = zeros(d, c)
        if z > best_z:
            best_d, best_c, best_z = d, c, z
    return (
        [int(x) % Z for x in best_d],
        [int(x) % Z for x in best_c],
    )


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _cn_minsum_kernel(qs, alpha: float, beta: float):
    """Branchless sign-magnitude min-sum CN update; bit-exact vs golden."""
    mags = [jnp.abs(q) for q in qs]
    sbits = [_i32(q) & SIGN_MASK for q in qs]
    total = _xor_tree(sbits)
    excl = _prefix_suffix_excl_min(mags)
    outs = []
    for e in range(len(qs)):
        mag = excl[e]
        if beta != 0.0:
            mag = jnp.maximum(mag - beta, 0.0)
        if alpha != 1.0:
            mag = mag * alpha
        outs.append(_f32(_i32(mag) | (total ^ sbits[e])))
    return outs


def _phi(x):
    x = jnp.clip(x, SP_MIN_MAG, SP_MAX_MAG)
    return -jnp.log(jnp.tanh(x * 0.5))


def _ctilde_k(x):
    # FMA-safe 3-segment PWL of log(1+e^-x): power-of-two slopes (see
    # the sumproduct-fast contract in tpu_ldpc/golden/decoder.py)
    return jnp.maximum(
        jnp.maximum(
            jnp.maximum(0.6931472 - 0.5 * x, 0.57 - 0.25 * x),
            0.40 - 0.125 * x,
        ),
        0.0,
    )


def _fpair_k(a, b):
    d1 = _ctilde_k(a + b)
    d2 = _ctilde_k(jnp.abs(a - b))
    return jnp.maximum(jnp.minimum(a, b) + (d1 - d2), 0.0)


def _cn_sumproduct_fast_kernel(qs, alpha: float, beta: float):
    """lambda-min2 PWL sum-product CN update, branchless sign-magnitude
    form; bit-exact vs the golden sumproduct-fast contract (all ops are
    exact-or-correctly-rounded fp32 min/max/add/mul — no transcendentals,
    which is the whole point vs _cn_sumproduct_kernel)."""
    del alpha, beta
    d = len(qs)
    mags = [jnp.abs(q) for q in qs]
    sbits = [_i32(q) & SIGN_MASK for q in qs]
    total = _xor_tree(sbits)
    if d == 1:
        outs_mag = [mags[0]]
    elif d == 2:
        outs_mag = [mags[1], mags[0]]
    else:
        # three-smallest scan with first-occurrence slot argmins (the
        # values are pure multiset statistics; argmins only route which
        # f-pair each edge reads)
        big = jnp.full_like(mags[0], jnp.inf)
        m1, m2, m3 = mags[0], big, big
        a1 = jnp.zeros(mags[0].shape, jnp.int32)
        a2 = jnp.full(mags[0].shape, -1, jnp.int32)
        for t in range(1, d):
            mt = mags[t]
            lt1 = mt < m1
            lt2 = jnp.logical_and(jnp.logical_not(lt1), mt < m2)
            lt3 = jnp.logical_and(
                jnp.logical_not(jnp.logical_or(lt1, lt2)), mt < m3
            )
            m3 = jnp.where(jnp.logical_or(lt1, lt2), m2,
                           jnp.where(lt3, mt, m3))
            m2 = jnp.where(lt1, m1, jnp.where(lt2, mt, m2))
            a2 = jnp.where(lt1, a1, jnp.where(lt2, t, a2))
            m1 = jnp.where(lt1, mt, m1)
            a1 = jnp.where(lt1, t, a1)
        f23 = _fpair_k(m2, m3)
        f13 = _fpair_k(m1, m3)
        f12 = _fpair_k(m1, m2)
        outs_mag = [
            jnp.where(a1 == t, f23, jnp.where(a2 == t, f13, f12))
            for t in range(d)
        ]
    return [
        _f32(_i32(outs_mag[e]) | (total ^ sbits[e])) for e in range(d)
    ]


def _cn_sumproduct_kernel(qs, alpha: float, beta: float):
    """Stable sign/phi sum-product CN update (matches golden within fp
    tolerance; transcendentals dominate, so no bit tricks here)."""
    del alpha, beta
    mags = [jnp.abs(q) for q in qs]
    sbits = [_i32(q) & SIGN_MASK for q in qs]
    total = _xor_tree(sbits)
    phis = [_phi(m) for m in mags]
    tot = phis[0]
    for p in phis[1:]:
        tot = tot + p
    outs = []
    for e in range(len(qs)):
        mag = _phi(tot - phis[e])
        outs.append(_f32(_i32(mag) | (total ^ sbits[e])))
    return outs


@functools.lru_cache(maxsize=64)
def build_pallas_decoder(
    code: LdpcCode,
    algo: str = "minsum",
    iters: int = 50,
    alpha: float = 0.75,
    beta: float = 0.0,
    schedule: str = "flooding",
    early_stop: bool = True,
    batch_tile: int = DEFAULT_BATCH_TILE,
    exit_block: int = 5,
    normalize: bool = True,
    unroll: int = 1,
    rescaled: bool = False,
    interpret: bool | None = None,
    dtype=jnp.float32,
    msg_dtype=None,
    compressed: bool = False,
    quant_bits: int | None = None,
    quant_step: float = 0.5,
    quant_post_bits: int | None = None,
):
    """Build a jitted Pallas decoder: llr (batch, n) -> (bits, ok, iters_used).

    msg_dtype: storage dtype for the CN->VN message scratch R (SURVEY.md
    M7 quantization lever).  None/float32 keeps the bit-exact contract;
    jnp.bfloat16 halves R's VMEM footprint and traffic — compute stays
    f32 (sublane rotates require 32-bit data), only loads/stores convert.
    Quantized modes trade the bit-exact-vs-golden property for
    throughput; min-sum is famously robust to message quantization
    (hardware decoders run 6-8 bit messages).

    quant_bits/quant_step/quant_post_bits: fixed-point hardware-emulation
    mode (min-sum only) — uniform round + symmetric saturation applied at
    the channel entry, the VN->CN messages, the CN outputs, and the
    posterior, per the contract in tpu_ldpc/golden/decoder.py.  This mode
    KEEPS the bit-exact-vs-golden property (all quantizer ops are exact
    fp32), unlike msg_dtype: it models a q-bit hardware datapath rather
    than compressing VMEM storage.

    Raises NotImplementedError if the code's message state cannot fit the
    VMEM budget (the decode.api dispatcher then falls back to the jnp
    reference decoder).
    """
    if algo not in ("minsum", "sumproduct", "sumproduct-fast"):
        raise ValueError(f"unknown algo {algo!r}")
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule {schedule!r}")
    if rescaled and (
        algo != "minsum" or schedule != "flooding" or beta != 0.0
        or compressed or quant_bits is not None or iters > 200
        or (msg_dtype is not None and msg_dtype != dtype)
    ):
        raise ValueError(
            "rescaled decoding requires algo='minsum', schedule='flooding',"
            " beta=0, full-precision messages, no quantization and"
            " iters <= 200"
        )
    lay = code.layout
    Z, mb, nb, E = lay.Z, lay.mb, lay.nb, lay.E

    def state_bytes(bt):
        # + one (nb, Z, bt) rotated/rescaled-L scratch when normalization
        # or rescaling is on — FLOODING ONLY (has_lrot below): the
        # layered path never allocates it, and charging it anyway made
        # layered codes near the budget lose normalization (or halve
        # batch_tile) for memory that is never allocated (review r4:
        # nr1_r12_z64 layered fits at 11.22 MB but was billed 12.73)
        extra = (nb * Z * 4 * bt
                 if ((normalize or rescaled) and not compressed
                     and schedule == "flooding") else 0)
        return lay.vmem_bytes(bt) + extra

    requested_tile = batch_tile
    while batch_tile > 128 and state_bytes(batch_tile) > VMEM_BUDGET_BYTES:
        batch_tile //= 2
    if state_bytes(batch_tile) > VMEM_BUDGET_BYTES:
        # The normalization L scratch (nb*Z*4*bt) is a ~5% throughput
        # OPTIMIZATION, not a capability: when it alone pushes a big
        # code over the budget (e.g. nr1_r12_z64: 12.73 MB with it,
        # 11.22 without), drop normalization instead of rejecting —
        # outputs are bit-exact either way (pure relabeling).  Retry
        # from the CALLER'S tile, not the halved one: without the
        # scratch a larger tile may fit again (review r4).
        if normalize and not rescaled and not compressed and (
                lay.vmem_bytes(batch_tile) <= VMEM_BUDGET_BYTES):
            return build_pallas_decoder(
                code, algo=algo, iters=iters, alpha=alpha, beta=beta,
                schedule=schedule, early_stop=early_stop,
                batch_tile=requested_tile, exit_block=exit_block,
                normalize=False, unroll=unroll, rescaled=rescaled,
                interpret=interpret, dtype=dtype, msg_dtype=msg_dtype,
                compressed=compressed, quant_bits=quant_bits,
                quant_step=quant_step, quant_post_bits=quant_post_bits,
            )
        raise NotImplementedError(
            f"{code.name}: decoder state {state_bytes(batch_tile)} B "
            f"exceeds VMEM budget at batch_tile={batch_tile}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    ecol = [int(c) for c in lay.edge_col]
    if normalize and not compressed:
        row_off, col_off = _normalize_offsets(lay)
    else:
        row_off, col_off = [0] * mb, [0] * nb
    normalized_cols = any(c != 0 for c in col_off)
    # effective shifts after coordinate normalization (see
    # _normalize_offsets); zero-shift edges compile to no roll at all
    eshift = [
        int(lay.edge_shift[e] + row_off[lay.edge_row[e]]
            - col_off[lay.edge_col[e]]) % Z
        for e in range(E)
    ]
    row_edges = [lay.row_edges(i) for i in range(mb)]
    col_edges = [lay.col_edges(j) for j in range(nb)]
    n = lay.n
    f_alpha, f_beta = float(alpha), float(beta)
    # rescaled contract (golden/decoder.py decode() docstring): CN runs
    # with alpha=1 (no per-edge multiply); the scaled-L scratch is
    # multiplied in place by the constant 1/alpha once per iteration
    # (nb constant vector multiplies replace E per-edge multiplies —
    # a scalar-carried scale was measured SLOWER: the SREG broadcast
    # serializes against the vector pipeline).
    k_alpha = 1.0 if rescaled else f_alpha
    inv_alpha = float(np.float32(1.0) / np.float32(alpha))
    cn_update = {
        "minsum": _cn_minsum_kernel,
        "sumproduct": _cn_sumproduct_kernel,
        "sumproduct-fast": _cn_sumproduct_fast_kernel,
    }[algo]
    if msg_dtype is None:
        msg_dtype = dtype
    quantized = msg_dtype != dtype
    qz = sat_msg = sat_post = None
    if quant_bits is not None:
        if algo != "minsum":
            raise ValueError("quantized decoding supports algo='minsum' only")
        if compressed or quantized:
            raise NotImplementedError(
                "fixed-point quant mode excludes compressed/msg_dtype modes"
            )
        from tpu_ldpc.decode.reference import make_quantizers

        qz, sat_msg, sat_post = make_quantizers(
            int(quant_bits), float(quant_step),
            int(quant_post_bits) if quant_post_bits is not None
            else int(quant_bits) + 2,
        )
    if compressed:
        # compressed row state replaces per-edge R entirely
        if algo != "minsum" or schedule != "flooding" or quantized:
            raise NotImplementedError(
                "compressed row state: minsum + flooding + f32 only"
            )
        if lay.max_row_deg > 8:
            raise NotImplementedError(
                "compressed row state packs signs into int8: row degree <= 8"
            )
    # slot index of each edge within its row (for compressed reconstruction)
    eslot = [e - int(lay.row_ptr[lay.edge_row[e]]) for e in range(E)]

    def load_R(R_scr, e):
        r = R_scr[e]
        return r.astype(dtype) if quantized else r

    def store_R(R_scr, e, val):
        R_scr[e] = val.astype(msg_dtype) if quantized else val

    def syndrome_violations(P_scr):
        """Standalone syndrome pass: total violation count, (1, B) int32."""
        viols = []
        for i in range(mb):
            par = _xor_tree([
                _i32(_roll_to_check(P_scr[ecol[e]], eshift[e], Z)) & SIGN_MASK
                for e in row_edges[i]
            ])
            viols.append(
                jnp.sum((par != 0).astype(jnp.int32), axis=0, keepdims=True)
            )
        out = viols[0]
        for v in viols[1:]:
            out = out + v
        return out

    # mutable L copy: needed to amortize the normalization rotation, and
    # by the rescaled contract (the scaled-L scratch mutates per iter)
    has_lrot = (normalized_cols or rescaled) and schedule == "flooding"

    def kernel(L_ref, bits_ref, ok_ref, iu_ref, P_scr, R_scr, *extra):
        # Normalized variable coordinates: the per-column entry
        # rotation happens ONCE here into the L_rot scratch (nb rolls
        # per decode, amortized over all iterations — an XLA-side
        # gather was measured to cost as much as the rolls it saved,
        # artifacts/tpu_session_r2.json), and the decoded bits are
        # un-rotated once on the way out.
        L_rot = extra[0] if has_lrot else None
        zero_msgs = jnp.zeros((Z, batch_tile), msg_dtype)
        L = L_ref if L_rot is None else L_rot
        for j in range(nb):
            v = _roll_to_check(L_ref[j], col_off[j], Z)
            if L_rot is not None:
                # rescaled: the scratch holds the NEXT iteration's scaled
                # L (alpha^-1 at init).  The multiply feeds ONLY a store:
                # a product consumed by an add can be FMA-fused by the
                # backend (unrounded product), silently breaking the
                # bit-exact contract vs golden's rounded multiply —
                # observed at iteration ~110 on adversarial LLRs.
                L_rot[j] = v * inv_alpha if rescaled else v
            P_scr[j] = v
        for e in range(E):
            R_scr[e] = zero_msgs

        ok_ref[...] = jnp.zeros((1, batch_tile), jnp.int32)
        iu_ref[...] = jnp.full((1, batch_tile), iters, jnp.int32)

        def cn_pass_fused():
            """CN pass; returns the violation count of the *pre-pass*
            posterior for free (t = roll(P_j, -s) is shared).  With
            early termination off the parity work is skipped entirely."""
            viols = []
            for i in range(mb):
                es = row_edges[i]
                ts = [
                    _roll_to_check(P_scr[ecol[e]], eshift[e], Z) for e in es
                ]
                if early_stop:
                    par = _xor_tree([_i32(t) & SIGN_MASK for t in ts])
                    viols.append(
                        jnp.sum((par != 0).astype(jnp.int32), axis=0,
                                keepdims=True)
                    )
                qs = [t - load_R(R_scr, e) for t, e in zip(ts, es)]
                if sat_msg is not None:
                    qs = [sat_msg(q) for q in qs]
                for e, r_new in zip(es, cn_update(qs, k_alpha, f_beta)):
                    store_R(R_scr, e, qz(r_new) if qz is not None else r_new)
            if not early_stop:
                return None
            viol = viols[0]
            for v in viols[1:]:
                viol = viol + v
            return viol

        def vn_pass():
            # sequential accumulation in ascending block-row order (the
            # golden contract fixes this order; chains are <= max col deg)
            for j in range(nb):
                p = L[j]
                if rescaled:
                    # L holds this iteration's scale already (see init);
                    # advance it for the NEXT iteration with a multiply
                    # whose result feeds ONLY the store — an add-consumed
                    # product is FMA-fusable (unrounded) on some
                    # backends, which breaks golden bit-exactness
                    L[j] = p * inv_alpha
                for e in col_edges[j]:
                    p = p + _roll_to_var(load_R(R_scr, e), eshift[e], Z)
                P_scr[j] = sat_post(p) if sat_post is not None else p

        def latch(viol, it_minus_1):
            """Convergence bookkeeping for the posterior checked by `viol`.
            Latches hard decisions (== freezing: lanes are independent)."""
            ok_now = (viol == 0).astype(jnp.int32)
            newly = ok_now * (1 - ok_ref[...])
            keep = newly[0, :] == 1
            for j in range(nb):
                hard = (P_scr[j] < 0).astype(jnp.int8)
                bits_ref[j] = jnp.where(keep, hard, bits_ref[j])
            iu_ref[...] = jnp.where(
                newly == 1, it_minus_1, iu_ref[...]
            ).astype(jnp.int32)
            ok_ref[...] = jnp.maximum(ok_ref[...], ok_now)

        if schedule == "flooding":
            def one_iter(it):
                # iteration `it` detects convergence of the posterior
                # produced by iteration it-1 (it=1 checks the raw channel
                # decision: iters_used=0) — golden contract preserved.
                viol = cn_pass_fused()
                if early_stop:
                    latch(viol, it - 1)
                vn_pass()
        else:
            def one_iter(it):
                for i in range(mb):
                    es = row_edges[i]
                    qs_raw = [
                        _roll_to_check(P_scr[ecol[e]], eshift[e], Z)
                        - load_R(R_scr, e)
                        for e in es
                    ]
                    # message saturation feeds the CN only; the posterior
                    # update keeps the wide APP value (golden contract)
                    qs = ([sat_msg(q) for q in qs_raw]
                          if sat_msg is not None else qs_raw)
                    outs = cn_update(qs, f_alpha, f_beta)
                    if qz is not None:
                        outs = [qz(r) for r in outs]
                    for e, q, r_new in zip(es, qs_raw, outs):
                        p_new = q + r_new
                        if sat_post is not None:
                            p_new = sat_post(p_new)
                        P_scr[ecol[e]] = _roll_to_var(p_new, eshift[e], Z)
                        store_R(R_scr, e, r_new)
                if early_stop:
                    latch(syndrome_violations(P_scr), it)

            if early_stop:
                latch(syndrome_violations(P_scr), 0)

        def body(it, _):
            one_iter(it)
            return 0

        # all-done early exit at exit_block granularity: scalar reads of
        # the done mask stall the vector pipeline, so guard per block.
        # With early_stop off the mask never sets — skip the guard (and
        # its scalar reductions) entirely and run one flat loop, unrolled
        # `unroll` iterations per trip (the body ignores `it` on this
        # path, so unrolling is purely a scheduling lever).
        if not early_stop:
            u = max(1, unroll)
            n_trips, rem = divmod(iters, u)

            def body_u(t, _):
                for _k in range(u):
                    one_iter(0)
                return 0

            if n_trips:
                jax.lax.fori_loop(0, n_trips, body_u, 0)
            for _k in range(rem):
                one_iter(0)
        else:
            g = max(1, exit_block)
            n_blocks, rem = divmod(iters, g)

            def block(b, _):
                done = ok_ref[0, :]

                @pl.when(jnp.sum(done) < batch_tile)
                def _():
                    jax.lax.fori_loop(b * g + 1, b * g + g + 1, body, 0)

                return 0

            jax.lax.fori_loop(0, n_blocks, block, 0)
            if rem:
                jax.lax.fori_loop(n_blocks * g + 1, iters + 1, body, 0)

        if schedule == "flooding":
            # final posterior still needs one standalone syndrome check
            viol = syndrome_violations(P_scr)
            if early_stop:
                latch(viol, iters)
            else:
                ok_ref[...] = (viol == 0).astype(jnp.int32)
        elif not early_stop:
            viol = syndrome_violations(P_scr)
            ok_ref[...] = (viol == 0).astype(jnp.int32)

        done = ok_ref[0, :]
        for j in range(nb):
            if col_off[j] == 0:
                hard = (P_scr[j] < 0).astype(jnp.int8)
                if early_stop:
                    bits_ref[j] = jnp.where(done == 1, bits_ref[j], hard)
                else:
                    bits_ref[j] = hard
            else:
                # leave normalized coordinates: un-rotate in int32
                # (int8 sublane rolls are unimplemented in Mosaic);
                # int8 only at the VMEM boundary.  Latched bits in
                # bits_ref are still rotated — merge first, roll once.
                hard = (P_scr[j] < 0).astype(jnp.int32)
                if early_stop:
                    hard = jnp.where(
                        done == 1, bits_ref[j].astype(jnp.int32), hard
                    )
                bits_ref[j] = _roll_to_var(hard, col_off[j], Z).astype(
                    jnp.int8
                )

    def kernel_compressed(L_ref, bits_ref, ok_ref, iu_ref,
                          P_scr, M1, M2, ARG, SGN):
        """Flooding min-sum with compressed per-row message state.

        Instead of E per-edge CN->VN messages, each block-row stores
        (min1', min2', argmin slot, packed output-sign byte) — the
        complete description of its extrinsic outputs (the classic
        hardware compression).  R_e is reconstructed exactly:
            mag  = argmin==slot ? min2' : min1'
            sign = (signs >> slot) & 1
        so the decode stays bit-exact vs the golden model while message
        VMEM traffic drops ~3x.  Requires row degree <= 8 (int8 signs).
        """
        for j in range(nb):
            P_scr[j] = L_ref[j]
        zf = jnp.zeros((Z, batch_tile), dtype)
        zb = jnp.zeros((Z, batch_tile), jnp.int8)
        for i in range(mb):
            M1[i] = zf
            M2[i] = zf
            ARG[i] = zb
            SGN[i] = zb
        ok_ref[...] = jnp.zeros((1, batch_tile), jnp.int32)
        iu_ref[...] = jnp.full((1, batch_tile), iters, jnp.int32)

        def reconstruct(i, slot):
            # int8 only at the VMEM boundary: int32 compute avoids
            # mask-layout mismatches between (8,128) f32 and (32,128)
            # int8 tilings in Mosaic
            arg = ARG[i].astype(jnp.int32)
            sgn = SGN[i].astype(jnp.int32)
            mag = jnp.where(arg == slot, M2[i], M1[i])
            bit = (sgn >> slot) & 1
            return _f32(_i32(mag) | (bit << 31))

        def cn_pass():
            viols = []
            for i in range(mb):
                es = row_edges[i]
                d = len(es)
                ts = [
                    _roll_to_check(P_scr[ecol[e]], eshift[e], Z) for e in es
                ]
                if early_stop:
                    par = _xor_tree([_i32(t) & SIGN_MASK for t in ts])
                    viols.append(
                        jnp.sum((par != 0).astype(jnp.int32), axis=0,
                                keepdims=True)
                    )
                qs = [
                    t - reconstruct(i, eslot[e]) for t, e in zip(ts, es)
                ]
                mags = [jnp.abs(q) for q in qs]
                sbits = [_i32(q) & SIGN_MASK for q in qs]
                # sequential two-min scan (first-occurrence argmin):
                # identical tie semantics to the golden model
                min1 = mags[0]
                min2 = jnp.full_like(min1, jnp.inf)
                argm = jnp.zeros((Z, batch_tile), jnp.int32)
                for t_ in range(1, d):
                    new = mags[t_] < min1
                    min2 = jnp.where(new, min1, jnp.minimum(min2, mags[t_]))
                    argm = jnp.where(new, t_, argm)
                    min1 = jnp.where(new, mags[t_], min1)
                if d == 1:
                    min2 = min1
                total = _xor_tree(sbits)
                if f_beta != 0.0:
                    min1 = jnp.maximum(min1 - f_beta, 0.0)
                    min2 = jnp.maximum(min2 - f_beta, 0.0)
                if f_alpha != 1.0:
                    min1 = min1 * f_alpha
                    min2 = min2 * f_alpha
                byte = None
                for t_, sb in enumerate(sbits):
                    bit = jax.lax.shift_right_logical(total ^ sb, 31)
                    contrib = bit << t_
                    byte = contrib if byte is None else byte | contrib
                M1[i] = min1
                M2[i] = min2
                ARG[i] = argm
                SGN[i] = byte.astype(jnp.int8)
            if not early_stop:
                return None
            viol = viols[0]
            for v in viols[1:]:
                viol = viol + v
            return viol

        def vn_pass():
            for j in range(nb):
                p = L_ref[j]
                for e in col_edges[j]:
                    i = int(lay.edge_row[e])
                    p = p + _roll_to_var(
                        reconstruct(i, eslot[e]), eshift[e], Z
                    )
                P_scr[j] = p

        def latch(viol, it_minus_1):
            ok_now = (viol == 0).astype(jnp.int32)
            newly = ok_now * (1 - ok_ref[...])
            keep = newly[0, :] == 1
            for j in range(nb):
                hard = (P_scr[j] < 0).astype(jnp.int8)
                bits_ref[j] = jnp.where(keep, hard, bits_ref[j])
            iu_ref[...] = jnp.where(
                newly == 1, it_minus_1, iu_ref[...]
            ).astype(jnp.int32)
            ok_ref[...] = jnp.maximum(ok_ref[...], ok_now)

        def body(it, _):
            viol = cn_pass()
            if early_stop:
                latch(viol, it - 1)
            vn_pass()
            return 0

        if not early_stop:
            jax.lax.fori_loop(1, iters + 1, body, 0)
        else:
            g = max(1, exit_block)
            n_blocks, rem = divmod(iters, g)

            def block(b, _):
                done = ok_ref[0, :]

                @pl.when(jnp.sum(done) < batch_tile)
                def _():
                    jax.lax.fori_loop(b * g + 1, b * g + g + 1, body, 0)

                return 0

            jax.lax.fori_loop(0, n_blocks, block, 0)
            if rem:
                jax.lax.fori_loop(n_blocks * g + 1, iters + 1, body, 0)

        viol = syndrome_violations(P_scr)
        if early_stop:
            latch(viol, iters)
        else:
            ok_ref[...] = (viol == 0).astype(jnp.int32)
        done = ok_ref[0, :]
        for j in range(nb):
            hard = (P_scr[j] < 0).astype(jnp.int8)
            if early_stop:
                bits_ref[j] = jnp.where(done == 1, bits_ref[j], hard)
            else:
                bits_ref[j] = hard

    if compressed:
        chosen_kernel = kernel_compressed
        scratches = [
            pltpu.VMEM((nb, Z, batch_tile), dtype),
            pltpu.VMEM((mb, Z, batch_tile), dtype),
            pltpu.VMEM((mb, Z, batch_tile), dtype),
            pltpu.VMEM((mb, Z, batch_tile), jnp.int8),
            pltpu.VMEM((mb, Z, batch_tile), jnp.int8),
        ]
    else:
        chosen_kernel = kernel
        scratches = [
            pltpu.VMEM((nb, Z, batch_tile), dtype),
            pltpu.VMEM((E, Z, batch_tile), msg_dtype),
        ]
        if has_lrot:
            # rotated (and, under the rescaled contract, per-iteration
            # rescaled) channel LLRs: written at init, re-read by every
            # vn_pass (the layered schedule never re-reads L, so it
            # skips the scratch and rotates straight into P)
            scratches.append(pltpu.VMEM((nb, Z, batch_tile), dtype))

    @jax.jit
    def decode_fn(llr):
        batch = llr.shape[0]
        padded = -(-batch // batch_tile) * batch_tile
        x = llr.astype(dtype)
        if qz is not None:
            x = qz(x)  # channel-entry quantization (golden contract step 1)
        x = x.T  # (n, batch)
        if padded != batch:
            # pad lanes with strong "zero codeword" LLRs: they converge
            # immediately and never hold the early exit back
            x = jnp.pad(x, ((0, 0), (0, padded - batch)),
                        constant_values=100.0)
        x = x.reshape(nb, Z, padded)
        num_tiles = padded // batch_tile

        bits, ok, iu = pl.pallas_call(
            chosen_kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (nb, Z, batch_tile),
                    lambda t: (0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (nb, Z, batch_tile),
                    lambda t: (0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, batch_tile), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, batch_tile), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, Z, padded), jnp.int8),
                jax.ShapeDtypeStruct((1, padded), jnp.int32),
                jax.ShapeDtypeStruct((1, padded), jnp.int32),
            ],
            scratch_shapes=scratches,
            interpret=interpret,
        )(x)

        bits = bits.reshape(n, padded).T[:batch].astype(jnp.uint8)
        return bits, ok[0, :batch] > 0, iu[0, :batch]

    return decode_fn
