"""Last-call attack on the two stalled family cells (VERDICT r2 #10)
with the QC-PEG construction (codes/peg.py) — a genuinely different
algorithm from the anneal pipeline both cells already survived.

Candidates per cell: PEG shift assignment on the COMMITTED support
(same degree profile) x {weight, index, random} edge orderings x
N_SEEDS seeds, each polished by a joint ace6+ace8 low-temperature
anneal.  Adoption gate identical to scripts/upgrade_family_tables.py:
paired-seed FER at two operating points; adopt only if no point
regresses beyond noise (ratio <= 1.05) and one improves substantially
(ratio <= 0.8).  Win or lose, the result is appended to
artifacts/construction_report.md and the registry is frozen.

Run from repo root:  python scripts/attack_peg.py
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("OMP_NUM_THREADS", "1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CELLS = [("wimax", "1/2", 24), ("wimax", "3/4", 24)]
N_SEEDS = 2

from scripts.upgrade_family_tables import fer_points, pick_points  # noqa: E402


def candidates(family, rate, Z, seed):
    from tpu_ldpc.codes.base_graphs import count_4cycles, family_base_graph
    from tpu_ldpc.codes.peg import peg_candidate

    old = np.asarray(family_base_graph(family, rate, Z))
    out = []
    for order in ("weight", "index", "random"):
        for off in range(N_SEEDS):
            s = seed + 211 * off + {"weight": 0, "index": 31,
                                    "random": 62}[order]
            B, st = peg_candidate(old, Z, seed=s, col_order=order)
            if count_4cycles(B, Z) == 0 and not any(
                np.array_equal(B, b) for _, b in out
            ):
                out.append((f"peg-{order} s{off} c6={st['c6']} "
                            f"c8={st['c8']}", B))
    return out


def attack(cell):
    family, rate, Z = cell
    from tpu_ldpc.codes.alist import save_shift_table
    from tpu_ldpc.codes.base_graphs import family_base_graph, family_cell_seed
    from tpu_ldpc.codes.code import LdpcCode
    from tpu_ldpc.codes.expand import expand

    tag = f"{family}_r{rate.replace('/', '')}_z{Z}"
    seed = family_cell_seed(family, rate, Z) + 777
    old = np.asarray(family_base_graph(family, rate, Z))
    Hold = expand(old, Z)
    p1, p2 = pick_points(Hold, rate)
    fer_old = fer_points(Hold, rate, (p1, p2))

    def rates(f):
        return [fe / tot for fe, tot in f]

    best_name, best_B, best_fer = "committed", old, fer_old
    t0 = time.time()
    for name, B in candidates(family, rate, Z, seed):
        f = fer_points(expand(B, Z), rate, (p1, p2))
        ratios = [rn / max(ro, 1e-12)
                  for rn, ro in zip(rates(f), rates(best_fer))]
        print(f"  {tag} cand {name}: fer={f} "
              f"ratios={[round(r, 3) for r in ratios]}", flush=True)
        if max(ratios) <= 1.05 and min(ratios) <= 0.8:
            best_name, best_B, best_fer = name, B, f
    adopted = best_name != "committed"
    msg = (f"{tag} PEG pts=({p1},{p2}) committed={fer_old} -> {best_name}"
           f"{' ' + str(best_fer) if adopted else ''} "
           f"[{time.time() - t0:.0f}s]")
    if adopted:
        code = LdpcCode.from_base_graph(best_B, Z, name=tag)
        _ = code.layout
        save_shift_table(
            code, os.path.join(REPO, f"tpu_ldpc/codes/data/{tag}.qc")
        )
    print(msg, flush=True)
    return msg


if __name__ == "__main__":
    msgs = [attack(c) for c in CELLS]
    print(json.dumps(msgs, indent=1))
    print("PEG ATTACK DONE")
