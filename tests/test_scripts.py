"""CLI analysis scripts: compare_hausdorff and sign_error_report."""

import csv
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_comparison_csv(path, rows):
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["in mesh", "ref mesh", "Hausdorff dist new-ref",
                    "Hausdorff dist ref-new", "Hausdorff dist",
                    "Chamfer dist(-1: no input; -2: no reference)"])
        for name, hd, cd in rows:
            w.writerow([f"rec/mesh/{name}.ply", f"03_meshes/{name}.ply",
                        hd, hd, hd, cd])


def test_compare_hausdorff_table(tmp_path):
    before = os.path.join(tmp_path, "before.csv")
    after = os.path.join(tmp_path, "after.csv")
    _write_comparison_csv(before, [("a", 0.02, 100.0), ("b", 0.30, 500.0)])
    _write_comparison_csv(after, [("a", 0.03, 110.0), ("b", 0.10, 200.0)])
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts/compare_hausdorff.py"),
         before, after],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "a" in out and "b" in out and "MEAN" in out
    # the outlier marker follows the larger-Hausdorff row
    assert "<-- outlier" in out


def test_sign_error_report(tmp_path):
    # synthetic dataset dir: one shape with a tiny GT mesh (unit-ish
    # tetrahedron) + one model results dir with predictions
    import sys as _s
    _s.path.insert(0, ROOT)
    from points2surf_tpu.utils import mesh_io

    ds = os.path.join(tmp_path, "ds")
    os.makedirs(os.path.join(ds, "03_meshes"))
    with open(os.path.join(ds, "testset.txt"), "w") as fh:
        fh.write("shape0\n")
    v = np.array([[0, 0, 0], [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5]],
                 np.float32)
    f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    mesh_io.write_ply(os.path.join(ds, "03_meshes", "shape0.ply"), v, f)

    res = os.path.join(tmp_path, "results", "m_model", "ds")
    os.makedirs(os.path.join(res, "rec", "query_pts_ms"))
    os.makedirs(os.path.join(res, "rec", "dist_ms"))
    q = np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]], np.float32)
    np.save(os.path.join(res, "rec/query_pts_ms/shape0.xyz.npy"), q)
    # first query inside (positive), second outside -> one sign error if
    # the prediction flips the second
    np.save(os.path.join(res, "rec/dist_ms/shape0.xyz.npy"),
            np.array([0.05, 0.05], np.float32))
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts/sign_error_report.py"),
         ds, "testset.txt", res,
         "--cache_dir", os.path.join(tmp_path, "cache")],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "shape0" in out and "TOTAL" in out
    assert "50.00%" in out  # exactly one of two queries sign-flipped
