"""Benchmark: end-to-end SDF query throughput on the flagship model.

Measures the production reconstruction inner loop — on-device patch
extraction (kNN over the full cloud + distance-weighted sub-sampling) +
PointsToSurf forward + post-processing — in queries/sec on one chip, using
the bundled abc_minimal cloud and the paper's vanilla configuration
(300 patch points, 1000 sub-sample, net_size 1024).

Baseline: the reference evaluates 14 test sets at grid 256 in ~1 day on a
GTX 1070 (README.md:84). At ~2M near-surface queries per shape and ~20
shapes per set that is ~6.5k SDF queries/sec end-to-end; we use
BASELINE_QPS = 6500 for vs_baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_QPS = 6500.0


def main():
    import jax

    from points2surf_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from points2surf_tpu.infer.query import make_sdf_query_fn
    from points2surf_tpu.models.p2s import PointsToSurfModel
    from points2surf_tpu.ops.patches import PatchConfig
    from points2surf_tpu.ops.voxel import grid_query_points

    root = os.path.dirname(os.path.abspath(__file__))
    cloud_file = os.path.join(
        root,
        "datasets/abc_minimal/04_pts",
        "00011084_fddd53ce45f640f3ab922328_trimesh_019.xyz.npy",
    )
    pts = np.load(cloud_file)[:, :3].astype(np.float32)
    n = pts.shape[0]
    n_pad = -(-n // 16384) * 16384
    padded = np.zeros((n_pad, 3), np.float32)
    padded[:n] = pts
    pts_dev = jnp.asarray(padded)

    # realistic reconstruction queries: near-surface grid voxel centers
    queries = grid_query_points(pts, 256, 3)

    batch = int(os.environ.get("P2S_BENCH_BATCH", "4096"))
    dtype = (
        jnp.bfloat16
        if os.environ.get("P2S_BENCH_DTYPE", "") == "bf16"
        else None
    )
    cfg = PatchConfig(
        points_per_patch=300, patch_radius=0.0, sub_sample_size=1000
    )
    model = PointsToSurfModel(
        net_size_max=1024, output_dim=2, use_point_stn=True,
        use_feat_stn=True, shared_transformation=True, dtype=dtype,
    )
    dummy = {
        "patch_pts_ps": jnp.zeros((2, 300, 3)),
        "pts_sub_sample_ms": jnp.zeros((2, 1000, 3)),
        "imp_surf_query_point_ms": jnp.zeros((2, 3)),
    }
    variables = model.init(jax.random.key(0), dummy, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    outputs = ("imp_surf_magnitude", "imp_surf_sign")
    query_fn = make_sdf_query_fn(model, outputs, cfg, fixed_radius=False)

    def run(i):
        q = jnp.asarray(queries[(i * batch) % (len(queries) - batch):][:batch])
        key = jax.random.key(i)
        return query_fn(params, batch_stats, pts_dev, q, n, key)

    # compile + warmup
    jax.block_until_ready(run(0))

    iters = int(os.environ.get("P2S_BENCH_ITERS", "10"))
    t0 = time.time()
    for i in range(1, iters + 1):
        out = run(i)
    jax.block_until_ready(out)
    dt = time.time() - t0
    qps = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": "sdf_queries_per_sec_per_chip",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / BASELINE_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # the tunneled compile service occasionally
        # dies with a transient HTTP 500; one retry rides it out
        print(f"bench attempt failed ({e}); retrying once", file=sys.stderr)
        main()
