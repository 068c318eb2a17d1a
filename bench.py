"""Benchmark: production throughput of the flagship pipeline on one chip.

Three numbers (all timed via host fetches — `jax.block_until_ready` does
NOT synchronize through the axon tunnel, docs/PERFORMANCE.md):

1. sdf_queries_per_sec_per_chip — the reconstruction inner loop: on-device
   patch extraction (kNN over the full cloud + distance-weighted
   sub-sampling) + PointsToSurf forward + post-processing, vanilla config
   (300 patch points, 1000 sub-sample, net_size 1024) on the bundled
   abc_minimal cloud. Baseline 6,500 q/s: the reference evaluates 14 test
   sets at grid 256 in ~1 day on a GTX 1070 (README.md:84) ≈ 2M
   near-surface queries x ~20 shapes x 14 sets / 86400 s.
2. secs_per_mesh_256 — one full shape at 256³ steady state: grid query
   generation + SDF sweep + splat + sign propagation + native marching
   tetrahedra. Baseline 308 s/mesh (same ~1 day / ~280 meshes).
3. train_patches_per_sec — the fused train step (extraction + fwd/bwd +
   SGD in one dispatch) at batch 1000 in the production float32 config
   (the experimental bf16 step rides along as an extra field; bf16
   training is not reconstruction-grade, docs/VALIDATION.md round 3).
   Baseline 1,736 patches/s: the reference trains ~5M patches/epoch in
   ~48 min on 4x RTX 2080 Ti (README.md:119).

Prints ONE JSON line; primary metric is (1), the others ride along as
extra fields.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_QPS = 6500.0
BASELINE_SECS_PER_MESH = 308.0
BASELINE_TRAIN_PPS = 1736.0


def _measure_rtt(jnp):
    """Tunnel round-trip latency: fetch a trivial computation repeatedly."""
    x = jnp.zeros((8,))
    float(jnp.sum(x))  # warm
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(x))
        best = min(best, time.time() - t0)
    return best


def bench_qps(jax, jnp, np, model, params, batch_stats, cfg, pts_dev, n,
              queries, rtt):
    from points2surf_tpu.infer.query import make_sdf_query_fn

    batch = int(os.environ.get("P2S_BENCH_BATCH", "4096"))
    outputs = ("imp_surf_magnitude", "imp_surf_sign")
    query_fn = make_sdf_query_fn(model, outputs, cfg, fixed_radius=False)

    def run(i):
        q = jnp.asarray(queries[(i * batch) % (len(queries) - batch):][:batch])
        key = jax.random.key(i)
        return query_fn(params, batch_stats, pts_dev, q, n, key)

    float(jnp.sum(run(0)))  # compile + warmup (host fetch = real sync)

    iters = int(os.environ.get("P2S_BENCH_ITERS", "10"))
    t0 = time.time()
    out = None
    for i in range(1, iters + 1):
        out = run(i)
    # device stream is in-order: fetching the last output syncs them all
    float(jnp.sum(out))
    dt = max(time.time() - t0 - rtt, 1e-9)
    return batch * iters / dt


def bench_mesh(jax, jnp, np, model, params, batch_stats, cfg, pts_dev, n,
               pts, rtt):
    """Steady-state seconds per shape at 256³ (eval-script settings:
    grid 256, epsilon 3, sigma 5, certainty 13)."""
    from points2surf_tpu.infer.meshing import _build_volume
    from points2surf_tpu.infer.query import make_sdf_query_fn
    from points2surf_tpu.ops import marching_cubes
    from points2surf_tpu.ops.voxel import grid_query_points

    batch = int(os.environ.get("P2S_BENCH_BATCH", "4096"))
    outputs = ("imp_surf_magnitude", "imp_surf_sign")
    query_fn = make_sdf_query_fn(model, outputs, cfg, fixed_radius=False,
                                 coherent=True)

    # untrained weights predict one sign everywhere (no isosurface), so the
    # volume stage uses an analytic proxy SDF over the same query set — the
    # SDF sweep (the dominant cost) still runs the real model end-to-end
    center = pts.mean(0)
    r_mean = float(np.linalg.norm(pts - center, axis=1).mean())

    def one_mesh():
        t0 = time.time()
        queries = np.asarray(grid_query_points(pts, 256, 3), np.float32)
        nq = len(queries)
        pending = []
        for s in range(0, nq, batch):
            q = queries[s:s + batch]
            nb = len(q)
            if nb < batch:
                q = np.concatenate([q, np.repeat(q[:1], batch - nb, axis=0)])
            d = query_fn(params, batch_stats, pts_dev, jnp.asarray(q), n,
                         jax.random.key(s))
            pending.append(d)
        # fixed-arity device concat + few fetches (per-batch fetches cost a
        # tunnel round-trip each; same helper as infer/evaluator.py)
        from points2surf_tpu.infer.query import drain_batched_results
        dists = drain_batched_results(pending, nq)
        dists = np.sign(
            r_mean - np.linalg.norm(queries - center, axis=1)
        ).astype(np.float32) * np.maximum(np.abs(dists), 1e-4)
        # production volume path (infer/meshing.py): f16 fetch — the 67 MB
        # f32 volume transfer dominates this stage through the tunnel
        vol = np.asarray(_build_volume(
            jnp.asarray(queries), jnp.asarray(dists), nq, 256, 5, 13
        ).astype(jnp.float16)).astype(np.float32)
        v, f = marching_cubes.extract_isosurface(vol, 0.0)
        assert v.size > 0, "marching produced no surface"
        return time.time() - t0

    # two throwaway passes: the first compiles, the second flushes any
    # lazily-triggered recompiles/cache writes so the recorded number is
    # unambiguously steady-state (round-2 driver runs recorded a cold
    # 29.2 s vs 24.9 s warm); then report the best of two timed passes
    # (tunnel fetch noise is ~±1 s/pass)
    one_mesh()
    one_mesh()
    return min(one_mesh(), one_mesh())


def bench_train(jax, jnp, np, model, params, batch_stats, cfg, pts_dev, n,
                queries, rtt):
    import functools

    import optax

    from points2surf_tpu.models import losses as L
    from points2surf_tpu.ops.patches import extract_patches

    batch = int(os.environ.get("P2S_BENCH_TRAIN_BATCH", "1000"))
    outputs = ("imp_surf_magnitude", "imp_surf_sign")
    weights = {o: 1.0 for o in outputs}
    # dtype of the phase under test (the production default anneals: 80%
    # of epochs bf16, final 20% f32 — main() measures both phases and
    # blends). Params stay f32, so the caller's params/batch_stats are
    # reused as-is.
    if os.environ.get("P2S_BENCH_TRAIN_DTYPE", "bf16") == "bf16":
        model = model.clone(dtype=jnp.bfloat16)
    else:
        model = model.clone(dtype=None)
    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(p, bs, bt):
        pred, mutated = model.apply(
            {"params": p, "batch_stats": bs}, bt, True,
            mutable=["batch_stats"],
        )
        ll = L.compute_loss(pred, bt, outputs, weights, fixed_radius=False)
        return sum(ll), mutated["batch_stats"]

    @jax.jit
    def train_step(p, bs, opt, q, gt, key):
        bt = extract_patches(pts_dev, q, n, key, cfg=cfg, train=True)
        bt["imp_surf_ms"] = gt
        bt["imp_surf_magnitude_ms"] = jnp.abs(gt)
        bt["imp_surf_dist_sign_ms"] = (gt >= 0.0).astype(jnp.float32)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, bs, bt
        )
        updates, opt = tx.update(grads, opt, p)
        p = optax.apply_updates(p, updates)
        return p, new_bs, opt, loss

    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.randn(batch).astype(np.float32) * 0.05)

    def run(i, p, bs, opt):
        q = jnp.asarray(
            queries[(i * batch) % (len(queries) - batch):][:batch]
        )
        return train_step(p, bs, opt, q, gt, jax.random.key(i))

    p, bs, opt = params, batch_stats, opt_state
    p, bs, opt, loss = run(0, p, bs, opt)
    float(loss)  # compile + warmup

    iters = int(os.environ.get("P2S_BENCH_TRAIN_ITERS", "10"))
    t0 = time.time()
    for i in range(1, iters + 1):
        p, bs, opt, loss = run(i, p, bs, opt)
    float(loss)
    dt = max(time.time() - t0 - rtt, 1e-9)
    return batch * iters / dt


def main():
    import jax

    from points2surf_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

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
    queries = np.asarray(grid_query_points(pts, 256, 3), np.float32)

    dtype = (
        jnp.bfloat16
        if os.environ.get("P2S_BENCH_DTYPE", "") == "bf16"
        else None
    )
    # the production eval-sweep extraction config: candidate decimation 4
    # + approx coherent selection are the defaults since the round-5
    # reconstruction-grade gate (docs/VALIDATION.md round 5; HD/Chamfer
    # within sampling noise of exact, GT-eval MSE bit-identical)
    cfg = PatchConfig(
        points_per_patch=300, patch_radius=0.0, sub_sample_size=1000,
        subsample_candidates=4,
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
    variables = model.init(jax.random.key(0), dummy, True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    rtt = _measure_rtt(jnp)

    qps = bench_qps(jax, jnp, np, model, params, batch_stats, cfg,
                    pts_dev, n, queries, rtt)

    result = {
        "metric": "sdf_queries_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }

    # NOTE: a bf16-eval rider was measured here (round 4): 25,543 q/s vs
    # 26,117 f32 — the sweep is extraction/top-k-bound, not matmul-bound,
    # so the dtype lever buys nothing and is not benched
    # (docs/PERFORMANCE.md round 4, query-path decomposition). The
    # extraction levers (decimation 4 + approx select) ARE the default
    # production config since the round-5 gate and are what qps above
    # measures.

    if os.environ.get("P2S_BENCH_SKIP_TRAIN", "") != "1":
        # the headline train metric is the PRODUCTION default: float32
        # activations (bf16 training is not reconstruction-grade — sign
        # acuity near thin features, docs/VALIDATION.md round 3). The
        # bf16 step, the opt-in fast path for f1-level experimentation,
        # rides along as an extra field.
        # the TRAIN metric measures the production TRAINING extraction
        # config — full candidate depth (the round-5 decimation-4 gate
        # covered eval sweeps only; training keeps the PatchConfig
        # default of 8)
        train_cfg = PatchConfig(
            points_per_patch=300, patch_radius=0.0, sub_sample_size=1000
        )
        os.environ["P2S_BENCH_TRAIN_DTYPE"] = "f32"
        pps = bench_train(jax, jnp, np, model, params, batch_stats,
                          train_cfg, pts_dev, n, queries, rtt)
        os.environ["P2S_BENCH_TRAIN_DTYPE"] = "bf16"
        pps_bf16 = bench_train(jax, jnp, np, model, params, batch_stats,
                               train_cfg, pts_dev, n, queries, rtt)
        result["train_patches_per_sec"] = round(pps, 1)
        result["train_vs_baseline"] = round(pps / BASELINE_TRAIN_PPS, 3)
        result["train_pps_bf16_experimental"] = round(pps_bf16, 1)

    if os.environ.get("P2S_BENCH_SKIP_MESH", "") != "1":
        spm = bench_mesh(jax, jnp, np, model, params, batch_stats, cfg,
                         pts_dev, n, pts, rtt)
        result["secs_per_mesh_256"] = round(spm, 2)
        result["mesh_vs_baseline"] = round(BASELINE_SECS_PER_MESH / spm, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # the tunneled compile service occasionally
        # dies with a transient HTTP 500; one retry rides it out
        print(f"bench attempt failed ({e}); retrying once", file=sys.stderr)
        main()
