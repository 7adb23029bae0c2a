"""Registry-wide minimum-distance upper bounds (codes/dmin.py).

Information-set search (p<=2) per registry cell; pure CPU host work.

Write protocol (VERDICT r3 missing #2): artifacts/dmin_bounds.csv is
only ever replaced ATOMICALLY with a version containing at least the
rows it had before (resume keeps every existing row; each newly
finished cell rewrites the full CSV to a temp file and os.replace()s
it in).  A snapshot taken mid-sweep can therefore never capture a
partial overwrite — the r3 end-of-round snapshot clobbered a complete
25-cell artifact with a 9-cell partial exactly because the old script
recreated the file in place.

Run:  timeout 7200 nice python scripts/dmin_registry.py [restarts] [qc_restarts]

qc_restarts defaults to max(40, restarts // 12) so the per-subcode ISD
budget scales with the CLI budget instead of being hard-coded (ADVICE
r3).  The committed artifact was produced with `1500 120`.
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
    from tpu_ldpc.codes.nrlike import nrlike_code

    yield ("judged", LdpcCode.judged())
    for fam, lifts in (("wifi", (27, 54, 81)), ("wimax", (24, 48, 96))):
        for rate in ("1/2", "2/3", "3/4", "5/6"):
            for z in lifts:
                yield (f"{fam}_r{rate.replace('/', '')}_z{z}",
                       LdpcCode.from_family(fam, rate, z))
    # NR-like rate-compatible cells (codes/nrlike.py).  d_min here is
    # of the MOTHER code (all columns, incl. the two punctured blocks)
    # — the quantity that governs undetected errors at the decoder,
    # which always sees the full codeword.
    for z in (64, 32):  # z32 added r5 (VERDICT r4 #9)
        for rate in ("1/2", "2/3", "3/4", "5/6"):
            code = nrlike_code(rate, z)
            yield (code.name, code)
        for rate in ("1/5", "2/7", "2/5", "1/2", "2/3"):
            code = nrlike_code(rate, z, bg=2)
            yield (code.name, code)


def _write_atomic(rows):
    """Rewrite OUT with the full row list via temp-file + os.replace."""
    tmp = OUT + ".tmp"
    with open(tmp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        w.writeheader()
        w.writerows(rows)
    os.replace(tmp, OUT)


def main():
    from tpu_ldpc.codes.dmin import (
        dmin_upper_bound,
        dmin_upper_bound_qc,
        gf2_nullspace_basis,
    )

    restarts = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    qc_restarts = (int(sys.argv[2]) if len(sys.argv) > 2
                   else max(40, restarts // 12))
    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = list(csv.DictReader(f))
    done = {r["cell"] for r in rows}
    for cell, code in cells():
        if cell in done:
            print(f"{cell}: done, skip", flush=True)
            continue
        t0 = time.time()
        dim = gf2_nullspace_basis(code.H).shape[0]
        isd, c, st = dmin_upper_bound(code.H, restarts=restarts, seed=0)
        # QC restricted-subcode search (dramatically tighter at long
        # blocklength / low rate — DESIGN.md §6); judged/SC bases also
        # satisfy the info-first systematic layout it assumes.
        # ValueError = legitimate skip (e.g. no nonempty subcode);
        # RuntimeError = certificate failure and must propagate.
        try:
            qc, _, _ = dmin_upper_bound_qc(code, restarts=qc_restarts,
                                           seed=0)
        except ValueError as e:
            print(f"{cell}: qc search skipped ({e})", flush=True)
            qc = ""
        ub = min(isd, qc) if qc != "" else isd
        rows.append(dict(cell=cell, n=code.n, k=code.k, Z=code.Z,
                         rate=f"{code.rate:.3f}", dim=dim, dmin_ub=ub,
                         isd_ub=isd, qc_ub=qc, restarts=st["restarts"],
                         wall_s=round(time.time() - t0, 1),
                         ts=time.strftime("%Y-%m-%d %H:%M")))
        _write_atomic(rows)
        print(f"{cell}: d_min <= {ub}  (isd {isd}, qc {qc}, n={code.n}, "
              f"dim={dim}, {rows[-1]['wall_s']}s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
