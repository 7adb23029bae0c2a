"""Registry-wide minimum-distance upper bounds (codes/dmin.py).

Information-set search (p<=2) per registry cell; pure CPU host work.
Writes artifacts/dmin_bounds.csv incrementally (resumable: finished
cells are skipped on rerun).

Run:  timeout 7200 nice python scripts/dmin_registry.py [restarts]
"""

import csv
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "dmin_bounds.csv")
FIELDS = ["cell", "n", "k", "Z", "rate", "dim", "dmin_ub", "isd_ub",
          "qc_ub", "restarts", "wall_s", "ts"]


def cells():
    from tpu_ldpc.codes import LdpcCode

    yield ("judged", LdpcCode.judged())
    for fam, lifts in (("wifi", (27, 54, 81)), ("wimax", (24, 48, 96))):
        for rate in ("1/2", "2/3", "3/4", "5/6"):
            for z in lifts:
                yield (f"{fam}_r{rate.replace('/', '')}_z{z}",
                       LdpcCode.from_family(fam, rate, z))


def main():
    from tpu_ldpc.codes.dmin import (
        dmin_upper_bound,
        dmin_upper_bound_qc,
        gf2_nullspace_basis,
    )

    restarts = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = {r["cell"] for r in csv.DictReader(f)}
    new_file = not os.path.exists(OUT) or os.path.getsize(OUT) == 0
    fout = open(OUT, "a", newline="")
    w = csv.DictWriter(fout, fieldnames=FIELDS)
    if new_file:
        w.writeheader()
    for cell, code in cells():
        if cell in done:
            print(f"{cell}: done, skip", flush=True)
            continue
        t0 = time.time()
        dim = gf2_nullspace_basis(code.H).shape[0]
        isd, c, st = dmin_upper_bound(code.H, restarts=restarts, seed=0)
        # QC restricted-subcode search (dramatically tighter at long
        # blocklength / low rate — DESIGN.md §6); judged/SC bases also
        # satisfy the info-first systematic layout it assumes
        try:
            qc, _, _ = dmin_upper_bound_qc(code, restarts=120, seed=0)
        except (AssertionError, ValueError) as e:
            print(f"{cell}: qc search skipped ({e})", flush=True)
            qc = ""
        ub = min(isd, qc) if qc != "" else isd
        row = dict(cell=cell, n=code.n, k=code.k, Z=code.Z,
                   rate=f"{code.rate:.3f}", dim=dim, dmin_ub=ub,
                   isd_ub=isd, qc_ub=qc, restarts=st["restarts"],
                   wall_s=round(time.time() - t0, 1),
                   ts=time.strftime("%Y-%m-%d %H:%M"))
        w.writerow(row)
        fout.flush()
        print(f"{cell}: d_min <= {ub}  (isd {isd}, qc {qc}, n={code.n}, "
              f"dim={dim}, {row['wall_s']}s)", flush=True)
    fout.close()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
