"""Measured-FER-gated family table upgrade (what produced the committed
2026-08-18 registry tables; kept for reproducibility).

Run from the repo root:  python scripts/upgrade_family_tables.py

Per rate: constrained PEXIT mask search (col weight >= 4 where mb
allows; the regime that measured well at these blocklengths).
Per cell: candidates = [constrained-mask table, legacy-mask longer
anneal], all girth-6+ required; adopt the best candidate only if its
paired-seed FER beats the committed table at two operating points.
"""
import json
import os
import sys
from multiprocessing import Pool

import numpy as np

os.environ.setdefault("OMP_NUM_THREADS", "1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.environ.get("UPGRADE_WORKDIR", "/tmp")
sys.path.insert(0, REPO)

from tpu_ldpc.codes.base_graphs import (  # noqa: E402
    FAMILY_LIFTS as LIFTS, _RATE_SHAPES as RATES, family_cell_seed,
)

GRID = {
    "1/2": dict(lo=0.2, hi=1.6, step=0.05, max_iters=300),
    "2/3": dict(lo=0.9, hi=2.2, step=0.05, max_iters=300),
    "3/4": dict(lo=1.3, hi=2.6, step=0.05, max_iters=300),
    "5/6": dict(lo=1.9, hi=3.2, step=0.05, max_iters=300),
}
SCAN_START = {"1/2": 1.25, "2/3": 1.75, "3/4": 2.25, "5/6": 2.75}
RVAL = {"1/2": 0.5, "2/3": 2 / 3, "3/4": 0.75, "5/6": 5 / 6}


def search_rate(rate):
    from tpu_ldpc.codes.pexit import search_mask

    path = os.path.join(WORK, f"upmask_{rate.replace('/','')}.json")
    if os.path.exists(path):
        return
    mb, nb = RATES[rate]
    wmin = 4 if mb > 4 else 3
    mask, stats = search_mask(mb, nb, seed=21, steps=2200, col_w_min=wmin,
                              threshold_kwargs=GRID[rate])
    json.dump({"mask": mask.astype(int).tolist(),
               "th": stats["threshold_db"]}, open(path, "w"))
    print(f"search {rate}: th={stats['threshold_db']:.2f} "
          f"colw={stats['col_weights']}", flush=True)


def fer_points(H, rate, points, seed=987, target_fe=110, max_frames=48000):
    from tpu_ldpc._native import minsum_decode
    from tpu_ldpc.channel import noise_sigma2

    n = H.shape[1]
    out = []
    for ebn0 in points:
        sigma2 = noise_sigma2(ebn0, RVAL[rate])
        sig = np.sqrt(sigma2)
        rng = np.random.default_rng(seed)
        fe = tot = 0
        while tot < max_frames and fe < target_fe:
            b = 3000
            llr = (2.0 / sigma2) * (
                1.0 + sig * rng.standard_normal((b, n))
            ).astype(np.float32)
            bits, _, _ = minsum_decode(H, llr, iters=50, alpha=0.75)
            fe += int((bits != 0).any(axis=1).sum())
            tot += b
        out.append((fe, tot))
    return out


def pick_points(H, rate):
    """First ebn0 (0.25 grid) where committed FER < 2.5e-2, plus +0.25."""
    from tpu_ldpc._native import minsum_decode
    from tpu_ldpc.channel import noise_sigma2

    n = H.shape[1]
    ebn0 = SCAN_START[rate]
    for _ in range(12):
        sigma2 = noise_sigma2(ebn0, RVAL[rate])
        sig = np.sqrt(sigma2)
        rng = np.random.default_rng(555)
        fe = tot = 0
        while tot < 12000 and fe < 80:
            llr = (2.0 / sigma2) * (
                1.0 + sig * rng.standard_normal((3000, n))
            ).astype(np.float32)
            bits, _, _ = minsum_decode(H, llr, iters=50, alpha=0.75)
            fe += int((bits != 0).any(axis=1).sum())
            tot += 3000
        if fe / tot < 2.5e-2:
            return (ebn0, ebn0 + 0.25)
        ebn0 += 0.25
    return (ebn0, ebn0 + 0.25)


def cell_job(arg):
    family, rate, Z = arg
    from tpu_ldpc.codes.base_graphs import (
        build_from_mask, count_4cycles, count_6cycles, make_base_graph,
        family_base_graph, _RATE_SHAPES,
    )
    from tpu_ldpc.codes.anneal import anneal_shifts
    from tpu_ldpc.codes.expand import expand
    from tpu_ldpc.codes.code import LdpcCode

    tag = f"{family}_r{rate.replace('/','')}_z{Z}"
    seed = family_cell_seed(family, rate, Z)
    old = np.asarray(family_base_graph(family, rate, Z))
    Hold = expand(old, Z)
    p1, p2 = pick_points(Hold, rate)
    fer_old = fer_points(Hold, rate, (p1, p2))

    cands = []
    rec = json.load(open(os.path.join(WORK, f"upmask_{rate.replace('/','')}.json")))
    mask = np.asarray(rec["mask"], bool)
    Bc = build_from_mask(mask, Z, seed=seed)
    Bc, _ = anneal_shifts(Bc, Z, steps=15000, seed=seed, w4=1e6)
    if count_4cycles(Bc, Z) == 0:
        cands.append(("w4min", Bc))
    mb, nb = _RATE_SHAPES[rate]
    Bl = make_base_graph(mb, nb, Z, seed=seed,
                         info_weight=4 if mb >= 6 else 3)
    Bl, _ = anneal_shifts(Bl, Z, steps=15000, seed=seed, w4=1e6)
    if count_4cycles(Bl, Z) == 0:
        cands.append(("legacy15k", Bl))

    def rates(f):
        return [fe / tot for fe, tot in f]

    best_name, best_B, best_fer = "committed", old, fer_old
    for name, B in cands:
        f = fer_points(expand(B, Z), rate, (p1, p2))
        ratios = [rn / max(ro, 1e-12)
                  for rn, ro in zip(rates(f), rates(best_fer))]
        # adopt only on a clear win: no point regresses beyond noise AND
        # at least one point improves substantially
        if max(ratios) <= 1.05 and min(ratios) <= 0.8:
            best_name, best_B, best_fer = name, B, f
    adopted = best_name != "committed"
    msg = (f"{tag} pts=({p1},{p2}) old={fer_old} -> {best_name} "
           f"{best_fer if adopted else ''} c6={count_6cycles(best_B, Z)}")
    if adopted:
        code = LdpcCode.from_base_graph(best_B, Z, name=tag)
        _ = code.layout  # encodability/rank validation
        from tpu_ldpc.codes.alist import save_shift_table
        save_shift_table(code, os.path.join(REPO, f"tpu_ldpc/codes/data/{tag}.qc"))
    print(msg, flush=True)
    return msg


if __name__ == "__main__":
    for r in RATES:
        search_rate(r)
    cells = [(f, r, Z) for f in LIFTS for r in RATES for Z in LIFTS[f]]
    with Pool(2) as p:
        for _ in p.imap_unordered(cell_job, cells):
            pass
    print("UPGRADE DONE")
