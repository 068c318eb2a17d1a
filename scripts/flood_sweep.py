"""Flood-containment parameter sweep over saved reconstruction predictions.

Re-runs the volume pipeline (splat -> [seed filter] -> sign propagation ->
marching cubes) from an eval run's saved per-shape predictions
(``<rec_dir>/dist_ms`` + ``<rec_dir>/query_pts_ms``, written by
infer/evaluator.py) across a grid of (sigma, certainty_threshold,
seed_filter) settings, and reports Hausdorff/Chamfer vs the GT meshes plus
a flood-overflow measure per shape and setting. No model inference happens,
so a full sweep costs only volume builds — the cheap tail of an eval.

Reference context: the propagation semantics and its flood cliff are shared
with the reference (source/sdf.py:114-178); this tool quantifies whether any
parameter setting or the seed-filter pre-pass (ops/voxel.filter_seed_signs)
contains proc_00061-class floods without hurting clean shapes
(docs/VALIDATION.md round-3 analysis, VERDICT round-3 item 8).

Usage:
  python scripts/flood_sweep.py --rec_dir results/<model>/<ds>/rec \
      --gt_dir datasets/<ds>/03_meshes --grid_res 256 \
      --sigmas 5 --certainties 13 26 --seed_filters 0 2 4 8 \
      --out /tmp/flood_sweep.csv
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from points2surf_tpu.utils.jaxcfg import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from points2surf_tpu.evalx import metrics
from points2surf_tpu.infer.meshing import _build_volume, _pad_queries
from points2surf_tpu.ops import marching_cubes


def overflow_of(verts: np.ndarray, query_pts: np.ndarray, grid_res: int):
    """How far (model units) the mesh extends beyond the queried band
    (same diagnostic as infer/meshing.py); > 0 indicates flooding."""
    margin = 8.0 / grid_res
    lo = query_pts.min(0) - margin
    hi = query_pts.max(0) + margin
    return float(np.maximum(lo - verts.min(0), verts.max(0) - hi).max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rec_dir", required=True)
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--grid_res", type=int, default=256)
    ap.add_argument("--sigmas", type=int, nargs="+", default=[5])
    ap.add_argument("--certainties", type=int, nargs="+", default=[13])
    ap.add_argument("--seed_filters", type=int, nargs="+", default=[0])
    ap.add_argument("--samples", type=int, default=10000)
    ap.add_argument("--shapes", nargs="+", default=None)
    ap.add_argument("--out", default="/tmp/flood_sweep.csv")
    a = ap.parse_args()

    dist_dir = os.path.join(a.rec_dir, "dist_ms")
    pts_dir = os.path.join(a.rec_dir, "query_pts_ms")
    files = sorted(f for f in os.listdir(dist_dir) if f.endswith(".xyz.npy"))
    if a.shapes:
        files = [f for f in files if f[:-8] in a.shapes]

    gt_samples = {}
    rows = []
    for f in files:
        name = f[:-8]
        gt_file = os.path.join(a.gt_dir, name + ".ply")
        if not os.path.exists(gt_file):
            print(f"skip {name}: no GT mesh")
            continue
        gt_samples[name] = metrics._sample_mesh_file(gt_file, a.samples)
        dist = np.load(os.path.join(dist_dir, f))
        pts = np.load(os.path.join(pts_dir, f))
        pts_pad, dist_pad, n_q = _pad_queries(pts, dist)
        for sf in a.seed_filters:
            for sigma in a.sigmas:
                for cert in a.certainties:
                    t0 = time.time()
                    vol = np.asarray(
                        _build_volume(
                            jnp.asarray(pts_pad), jnp.asarray(dist_pad),
                            n_q, a.grid_res, sigma, cert, sf,
                        )
                    )
                    if not (vol.min() < 0.0 < vol.max()):
                        rows.append((name, sf, sigma, cert, -1.0, -1.0, -1.0))
                        continue
                    v, fcs = marching_cubes.extract_isosurface(vol, 0.0)
                    if v.size == 0:
                        rows.append((name, sf, sigma, cert, -1.0, -1.0, -1.0))
                        continue
                    v = (((v + 0.5) / float(a.grid_res)) - 0.5) * 2.0
                    rec = metrics.sample_mesh_surface(
                        v.astype(np.float32), fcs, a.samples
                    )
                    hd = metrics.hausdorff_distance(rec, gt_samples[name])[2]
                    cd = metrics.chamfer_distance(rec, gt_samples[name])
                    ov = overflow_of(v, pts, a.grid_res)
                    rows.append(
                        (name, sf, sigma, cert, round(hd, 4),
                         round(cd, 1), round(ov, 4))
                    )
                    print(
                        f"{name} filt={sf} sigma={sigma} cert={cert}: "
                        f"HD {hd:.4f} CD {cd:.1f} overflow {ov:.4f} "
                        f"({time.time() - t0:.1f}s)"
                    )

    with open(a.out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["shape", "seed_filter", "sigma", "certainty",
                    "hausdorff", "chamfer", "overflow"])
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {a.out}")

    # summary: per setting, mean/max HD and flood count (overflow > 0)
    from collections import defaultdict

    agg = defaultdict(list)
    for name, sf, sigma, cert, hd, cd, ov in rows:
        agg[(sf, sigma, cert)].append((hd, ov))
    print("\nsetting: mean_HD max_HD floods/n")
    for key in sorted(agg):
        vals = agg[key]
        hds = [h for h, _ in vals if h >= 0]
        floods = sum(1 for h, o in vals if o > 0 or h < 0)
        mean_hd = sum(hds) / max(len(hds), 1)
        max_hd = max(hds) if hds else -1
        print(f"filt={key[0]} sigma={key[1]} cert={key[2]}: "
              f"{mean_hd:.4f} {max_hd:.4f} {floods}/{len(vals)}")


if __name__ == "__main__":
    main()
