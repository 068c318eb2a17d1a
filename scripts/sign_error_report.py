"""Per-shape sign-error report for reconstruction grid queries.

Usage:
  python scripts/sign_error_report.py DATASET_DIR TESTSET RESULTS_DIR...

e.g.
  python scripts/sign_error_report.py datasets/proc_120 testset.txt \
      results/r3gate_f32_model/proc_120 results/r3thin_model/proc_120

For every shape in TESTSET, computes ground-truth signed distance at the
model's saved reconstruction query points (rec/query_pts_ms/*.xyz.npy,
identical across models for the same cloud/grid) against the GT mesh in
DATASET_DIR/03_meshes, then reports each model's sign-error rate from its
rec/dist_ms predictions. This measures sign quality at the exact queries
that feed sign propagation — the quantity whose clustered errors flood
volumes (docs/VALIDATION.md round 3) — and is far less noisy than the
flood-amplified Hausdorff. GT distances are cached next to this script's
--cache_dir (default /tmp/p2s_gt_signs/<dataset>).

Runs on CPU (forces the CPU backend so it can run alongside chip jobs).
"""

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset_dir")
    ap.add_argument("testset")
    ap.add_argument("results_dirs", nargs="+",
                    help="results/<model>/<dataset> dirs containing rec/")
    ap.add_argument("--cache_dir", default="")
    args = ap.parse_args(argv)

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from points2surf_tpu.ops import meshdist
    from points2surf_tpu.utils import mesh_io

    cache = args.cache_dir or os.path.join(
        "/tmp/p2s_gt_signs", os.path.basename(args.dataset_dir.rstrip("/"))
    )
    os.makedirs(cache, exist_ok=True)

    with open(os.path.join(args.dataset_dir, args.testset)) as fh:
        shapes = [l.strip() for l in fh if l.strip()]

    names = [d.rstrip("/").split("/")[-2] for d in args.results_dirs]
    print(f"{'shape':16s}" + "".join(f"{n[:18]:>20s}" for n in names))
    tot = {d: [0, 0] for d in args.results_dirs}
    for s in shapes:
        qf = os.path.join(args.results_dirs[0], "rec/query_pts_ms",
                          s + ".xyz.npy")
        if not os.path.isfile(qf):
            print(f"{s:16s}  (no reconstruction queries, skipped)")
            continue
        q = np.load(qf).astype(np.float32)
        cf = os.path.join(cache, s + ".npy")
        if os.path.isfile(cf):
            gt = np.load(cf)
            if len(gt) != len(q):
                gt = None
        else:
            gt = None
        if gt is None:
            v, f = mesh_io.load_mesh(
                os.path.join(args.dataset_dir, "03_meshes", s + ".ply")
            )
            gt = np.asarray(
                meshdist.signed_distance(v.astype(np.float32), f, q)
            )
            np.save(cf, gt)
        gti = gt > 0
        row = f"{s:16s}"
        for d in args.results_dirs:
            pred = np.load(
                os.path.join(d, "rec/dist_ms", s + ".xyz.npy")
            ) > 0
            err = pred != gti
            tot[d][0] += int(err.sum())
            tot[d][1] += err.size
            row += f"{err.mean() * 100:19.2f}%"
        print(row, flush=True)
    print(f"{'TOTAL':16s}" + "".join(
        f"{100 * tot[d][0] / max(tot[d][1], 1):19.2f}%"
        for d in args.results_dirs
    ))


if __name__ == "__main__":
    main()
