"""Compare two mesh_comparison CSVs shape-by-shape.

Usage: python scripts/compare_hausdorff.py BEFORE.csv AFTER.csv

Prints a per-shape table of Hausdorff / Chamfer deltas plus means — the
before/after view used for training-diversity experiments (e.g. the
thin-feature outlier study, docs/VALIDATION.md). CSV format is
evalx/metrics.mesh_comparison's (reference evaluation.py:355-380).
"""

import csv
import os
import sys


def load(path):
    rows = {}
    with open(path) as fh:
        for row in csv.reader(fh):
            if not row or row[0] == "in mesh":
                continue
            stem = os.path.splitext(os.path.basename(row[0]))[0]
            rows[stem] = (float(row[4]), float(row[5]))  # hausdorff, chamfer
    return rows


def main(before_csv, after_csv):
    before, after = load(before_csv), load(after_csv)
    stems = sorted(set(before) & set(after))
    if not stems:
        sys.exit("no common shapes between the two CSVs")
    print(f"{'shape':<14} {'hausdorff':>20} {'chamfer':>22}")
    print(f"{'':<14} {'before':>9} {'after':>10} {'before':>10} {'after':>11}")
    hb = ha = cb = ca = 0.0
    for s in stems:
        h0, c0 = before[s]
        h1, c1 = after[s]
        mark = " <-- outlier" if max(h0, h1) > 0.1 else ""
        print(f"{s:<14} {h0:>9.4f} {h1:>10.4f} {c0:>10.1f} {c1:>11.1f}{mark}")
        hb += h0
        ha += h1
        cb += c0
        ca += c1
    n = len(stems)
    print(
        f"{'MEAN':<14} {hb / n:>9.4f} {ha / n:>10.4f} "
        f"{cb / n:>10.1f} {ca / n:>11.1f}"
    )


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
