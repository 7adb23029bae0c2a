"""Edge-rate roofline audit across the tuned registry (VERDICT r4 #5).

r3 established on 4 cells that the fused kernel's EDGE RATE (edges
processed per second, ALU-issue-bound — DESIGN.md §8a) explains
family throughput.  This audit extends the claim to every cell with a
hardware-measured layered-twophase number (artifacts/
tpu_registry_knobs.json): the cost model is

    edge-iterations/frame  =  E * (K  +  (iters - K) * B / batch)

(phase 1: K layered iterations over the full batch; phase 2: the
remaining iterations over the compacted budget B of stragglers), and

    ps per edge-iteration  =  c1 + c2 * [Z % 8 != 0] + c3 * rowdeg

a THREE-parameter model fit by least squares, whose terms are the
round-5 findings this audit produced:

  * alignment (c2 ~ +1.7 ps/edge, ~+30%): every wifi cell (Z = 27,
    54, 81 — none a sublane multiple) costs more per edge than every
    aligned-Z cell (wimax 24/48/96, nr 64); the two populations
    separate cleanly at 7.1-8.5 vs 4.8-7.1 ps/edge — the circulant
    rotation of a non-8-aligned Z inside an 8-sublane-padded tile
    needs a wraparound fix-up where aligned Z is a single roll;
  * row degree (c3 ~ +0.11 ps/edge per unit): within each alignment
    class, high-rate cells (row degree ~20+) run slower PER EDGE than
    low-rate ones (~7) — the two-min scan along a long row is a
    serial dependency chain, so ILP drops as rows lengthen.

A one-constant edge-rate model leaves +-35% structured residuals;
with these terms the median |residual| is ~3% (max ~19%, the
smallest-n cells, which beat the model — fixed overheads amortize
against fewer edges and their phase-2 stragglers exit early).

Residual = measured/predicted - 1: large positive beats the model
(e.g. phase-2 early termination), large negative has headroom the
knobs didn't find.  nr2_r15_z64 (the low-rate flagship, VERDICT r4
#5's open question) lands among the FASTEST cells per edge — its low
absolute Gb/s is entirely k=640 against 13k lifted edges x iters, not
phase-2 headroom.

CPU-only: reads artifacts, builds layouts for E.  Writes
artifacts/roofline_audit.csv and prints the BASELINE.md table.
"""

import csv
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KNOBS_ART = os.path.join(REPO, "artifacts", "tpu_registry_knobs.json")
OUT = os.path.join(REPO, "artifacts", "roofline_audit.csv")

BATCH = 4096
ITERS = 25  # the tuner's layered budget (layered-25 == flooding-50 FER)


def build_cell(name):
    from tpu_ldpc.codes import LdpcCode
    from tpu_ldpc.codes.nrlike import nrlike_code

    if name == "judged":
        return LdpcCode.judged()
    fam, rate, z = name.split("_")
    rate = rate[1] + "/" + rate[2]
    z = int(z[1:])
    if fam in ("wifi", "wimax"):
        return LdpcCode.from_family(fam, rate, z)
    assert fam.startswith("nr")
    return nrlike_code(rate, z, bg=int(fam[2:]))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    with open(KNOBS_ART) as f:
        cells = json.load(f)["cells"]

    rows = []
    for name, rec in sorted(cells.items()):
        if "layered_twophase_gbps" not in rec:
            rows.append({"cell": name, "note": rec.get(
                "skipped", rec.get("error", "no measured gbps"))})
            continue
        code = build_cell(name)
        lay = code.layout
        E = int(lay.E) * code.Z  # lifted edges
        K, B = rec["K"], rec["budget"]
        eipf = E * (K + (ITERS - K) * B / BATCH)
        meas = rec["layered_twophase_gbps"]
        rows.append({
            "cell": name, "n": code.n, "k": code.k,
            "E_lifted": E, "K": K, "budget": B,
            "z_aligned": code.Z % 8 == 0,
            "row_degree": round(int(lay.E) / lay.mb, 2),
            "edge_iters_per_frame": round(eipf, 1),
            "measured_gbps": meas,
            "ps_per_edge": round(
                code.k / (meas * 1e9) / eipf * 1e12, 2),
        })

    ok = [r for r in rows if "ps_per_edge" in r]
    # least-squares fit: t_frame = eipf*(c1 + c2*unaligned + c3*rowdeg)
    eipf = np.array([r["edge_iters_per_frame"] for r in ok])
    unal = np.array([0.0 if r["z_aligned"] else 1.0 for r in ok])
    rdeg = np.array([r["row_degree"] for r in ok])
    t = np.array([r["k"] / (r["measured_gbps"] * 1e9) for r in ok])
    A = np.stack([eipf, eipf * unal, eipf * rdeg], axis=1)
    coef, *_ = np.linalg.lstsq(A, t, rcond=None)
    c1, c2, c3 = coef
    for r, pred_t in zip(ok, A @ coef):
        pred = r["k"] / pred_t / 1e9
        r["predicted_gbps"] = round(pred, 3)
        r["residual_pct"] = round(
            (r["measured_gbps"] / pred - 1) * 100, 1)

    fields = ["cell", "n", "k", "E_lifted", "K", "budget", "z_aligned",
              "row_degree", "edge_iters_per_frame", "measured_gbps",
              "predicted_gbps", "residual_pct", "ps_per_edge", "note"]
    tmp = OUT + ".tmp"
    with open(tmp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        for r in rows:
            w.writerow(r)
    os.replace(tmp, OUT)

    print(f"fit: ps/edge = {1e12 * c1:.2f} + {1e12 * c2:.2f}*[Z%8!=0]"
          f" + {1e12 * c3:.3f}*rowdeg  ({len(ok)} cells)")
    print(f"{'cell':<16}{'meas':>7}{'pred':>7}{'resid%':>8}{'ps/edge':>9}")
    for r in sorted(ok, key=lambda r: r["residual_pct"]):
        print(f"{r['cell']:<16}{r['measured_gbps']:>7.3f}"
              f"{r['predicted_gbps']:>7.3f}{r['residual_pct']:>8.1f}"
              f"{r['ps_per_edge']:>9.2f}")
    resid = [abs(r["residual_pct"]) for r in ok]
    print(f"|residual|: median {np.median(resid):.1f}% "
          f"max {max(resid):.1f}% "
          f"({max(ok, key=lambda r: abs(r['residual_pct']))['cell']})")


if __name__ == "__main__":
    main()
