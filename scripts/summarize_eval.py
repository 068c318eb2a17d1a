"""Summarize a full_eval results tree into one table row per dataset.

Reads the CSVs full_eval writes — eval/rme_comp_res.csv (file,mse,...)
and rec/hausdorff_dist_pred_rec.csv (in mesh,ref mesh,HD new-ref,HD
ref-new,HD,Chamfer; -1/-2 sentinels = missing input/reference) — and
prints mean/median/max per metric plus the worst shapes: the numbers
VALIDATION.md records for a run.

Usage: python scripts/summarize_eval.py results/r4flagship_1k_model
"""

import os
import sys

import numpy as np


def _rows(path):
    if not os.path.isfile(path):
        return []
    with open(path) as fh:
        return [ln.split(",") for ln in fh.read().splitlines()[1:] if ln]


def _summary(label, d):
    if not d:
        print(f"  {label:16s}: (missing)")
        return
    v = np.array(list(d.values()))
    worst = sorted(d, key=d.get, reverse=True)[:3]
    print(f"  {label:16s}: mean {v.mean():.4g}  median {np.median(v):.4g}  "
          f"max {v.max():.4g}  n={len(v)}  worst: "
          + ", ".join(f"{w.strip()}={d[w]:.3g}" for w in worst))


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "results/r4flagship_1k_model"
    for ds in sorted(os.listdir(root)):
        rec = os.path.join(root, ds, "rec", "hausdorff_dist_pred_rec.csv")
        ev = os.path.join(root, ds, "eval", "rme_comp_res.csv")
        if not os.path.isfile(rec) and not os.path.isfile(ev):
            continue
        print(f"== {ds} ==")
        mse = {r[0]: float(r[1]) for r in _rows(ev) if len(r) >= 2}
        _summary("MSE(GT query)", mse)
        hd, ch, bad = {}, {}, []
        for r in _rows(rec):
            if len(r) < 6:
                continue
            h, c = float(r[4]), float(r[5])
            if h < 0.0 or c < 0.0:
                bad.append(r[0].strip())
                continue
            hd[r[0]], ch[r[0]] = h, c
        _summary("Hausdorff", hd)
        _summary("Chamfer", ch)
        if bad:
            print(f"  sentinel rows (missing mesh/ref): {bad}")


if __name__ == "__main__":
    main()
