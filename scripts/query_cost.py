"""Decompose the fused eval query program: extraction vs forward vs fused.

The reconstruction sweep's end-to-end rate (~26k q/s, bench.py) sits ~4x
under the bare encoder chain's measured 66%-of-peak rate; this probe
locates the residual. It compiles three programs with the exact bench/
evaluator config (vanilla, batch P2S_PROBE_BATCH, abc_minimal cloud,
coherent kNN tiles) and prints XLA cost analysis for each:

  fused      — the production make_sdf_query_fn program (extraction +
               forward + post-processing, infer/query.py:55-101)
  extraction — extract_patches alone (ops/patches.py), outputs consumed
               via the returned batch tensors so nothing is dead-coded
  forward    — model.apply + post-processing on pre-extracted tensors

With P2S_QUERY_COST_TIME=1 it also executes each on the real chip
(host-fetch timing, rtt-subtracted — `block_until_ready` does not sync
through the axon tunnel, docs/PERFORMANCE.md) and prints ms/batch and
q/s, so wall-clock attribution = fused - extraction - forward reveals
dispatch/layout overhead. Counterpart of scripts/step_cost.py for the
eval path (the role of reference data_loader.py:322-421's hot loop).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from points2surf_tpu.utils.jaxcfg import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from points2surf_tpu.infer.query import make_sdf_query_fn
from points2surf_tpu.models.p2s import PointsToSurfModel
from points2surf_tpu.ops.patches import PatchConfig, extract_patches
from points2surf_tpu.ops.voxel import grid_query_points


def _report(name, compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_hbm = ca.get("bytes accessed", float("nan"))
    print(f"[{name}]")
    print(f"  flops               : {flops/1e12:.4f} TFLOP")
    print(f"  bytes accessed      : {bytes_hbm/1e9:.3f} GB")
    # v5e: ~197 TFLOP/s bf16 MXU, ~819 GB/s HBM
    print(f"  MXU-bound time @197T: {flops/197e12*1e3:.2f} ms")
    print(f"  HBM-bound time @819G: {bytes_hbm/819e9*1e3:.2f} ms")
    return flops, bytes_hbm


def _time(fn, fetch, rtt, iters=10):
    fetch(fn())  # warm
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    fetch(out)  # in-order stream: syncing the last syncs all
    return (time.time() - t0 - rtt) / iters


def main():
    batch = int(os.environ.get("P2S_PROBE_BATCH", "4096"))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cloud_file = os.path.join(
        root, "datasets/abc_minimal/04_pts",
        "00011084_fddd53ce45f640f3ab922328_trimesh_019.xyz.npy",
    )
    pts = np.load(cloud_file)[:, :3].astype(np.float32)
    n = pts.shape[0]
    n_pad = -(-n // 16384) * 16384
    padded = np.zeros((n_pad, 3), np.float32)
    padded[:n] = pts
    pts_dev = jnp.asarray(padded)
    queries = np.asarray(grid_query_points(pts, 256, 3), np.float32)
    q = jnp.asarray(queries[:batch])

    cfg = PatchConfig(points_per_patch=300, patch_radius=0.0,
                      sub_sample_size=1000)
    model = PointsToSurfModel(
        net_size_max=1024, output_dim=2, use_point_stn=True,
        use_feat_stn=True, shared_transformation=True,
    )
    dummy = {
        "patch_pts_ps": jnp.zeros((2, 300, 3)),
        "pts_sub_sample_ms": jnp.zeros((2, 1000, 3)),
        "imp_surf_query_point_ms": jnp.zeros((2, 3)),
    }
    variables = model.init(jax.random.key(0), dummy, True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    outputs = ("imp_surf_magnitude", "imp_surf_sign")

    # --- fused production program -------------------------------------
    query_fn = make_sdf_query_fn(model, outputs, cfg, fixed_radius=False,
                                 coherent=True)
    fused_c = jax.jit(
        lambda p, bs, pt, qq, k: query_fn(p, bs, pt, qq, n, k)
    ).lower(params, batch_stats, pts_dev, q, jax.random.key(0)).compile()
    _report("fused", fused_c)

    # --- extraction only ----------------------------------------------
    def extract_only(pt, qq, k):
        b = extract_patches(pt, qq, n, k, cfg=cfg, train=False,
                            coherent=True)
        # consume every network-facing tensor so XLA keeps the whole stage
        return (jnp.sum(b["patch_pts_ps"]) + jnp.sum(b["pts_sub_sample_ms"])
                + jnp.sum(b["patch_radius_ms"]))

    ext_c = jax.jit(extract_only).lower(
        pts_dev, q, jax.random.key(0)
    ).compile()
    _report("extraction", ext_c)

    # --- forward only --------------------------------------------------
    bt = {
        "patch_pts_ps": jnp.zeros((batch, 300, 3)),
        "pts_sub_sample_ms": jnp.zeros((batch, 1000, 3)),
        "imp_surf_query_point_ms": jnp.zeros((batch, 3)),
        "patch_radius_ms": jnp.ones((batch,)),
    }

    def forward_only(p, bs, b_in):
        from points2surf_tpu.models import losses as L

        pred = model.apply({"params": p, "batch_stats": bs}, b_in, False)
        mag = L.post_process_magnitude(pred[:, 0]) * b_in["patch_radius_ms"]
        return mag * L.post_process_sign(pred[:, 1])

    fwd_c = jax.jit(forward_only).lower(params, batch_stats, bt).compile()
    _report("forward", fwd_c)

    if os.environ.get("P2S_QUERY_COST_TIME", "0") != "1":
        return

    # --- wall-clock attribution on the chip ----------------------------
    x = jnp.zeros((8,))
    float(jnp.sum(x))
    rtt = float("inf")
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(x))
        rtt = min(rtt, time.time() - t0)
    keys = [jax.random.key(i) for i in range(1, 11)]
    it = iter(range(1000))
    t_fused = _time(
        lambda: query_fn(params, batch_stats, pts_dev, q, n,
                         keys[next(it) % 10]),
        lambda o: float(jnp.sum(o)), rtt,
    )
    it2 = iter(range(1000))
    t_ext = _time(
        lambda: jax.jit(extract_only)(pts_dev, q, keys[next(it2) % 10]),
        lambda o: float(o), rtt,
    )
    t_fwd = _time(
        lambda: jax.jit(forward_only)(params, batch_stats, bt),
        lambda o: float(jnp.sum(o)), rtt,
    )
    print(f"timed (batch {batch}, rtt {rtt*1e3:.1f} ms):")
    print(f"  fused      : {t_fused*1e3:8.2f} ms/batch "
          f"= {batch/t_fused:9.0f} q/s")
    print(f"  extraction : {t_ext*1e3:8.2f} ms/batch")
    print(f"  forward    : {t_fwd*1e3:8.2f} ms/batch")
    print(f"  residual (dispatch/layout): "
          f"{(t_fused - t_ext - t_fwd)*1e3:8.2f} ms/batch")


if __name__ == "__main__":
    main()
