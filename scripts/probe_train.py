"""Train-step microbenchmark for perf iteration (not part of bench.py).

Measures the fused train step (extraction + fwd/bwd + SGD) exactly like
bench.bench_train, with env switches for A/B variants:

  P2S_PROBE_CLOUD   path to a .xyz.npy cloud (default: abc_minimal shape)
  P2S_PROBE_BATCH   batch size (default 1000)
  P2S_PROBE_ITERS   timed iterations (default 10)
  P2S_PROBE_DTYPE   '' | 'bf16'   activation dtype
  P2S_PROBE_STN     '1' | '0'     use point/feat STNs
  P2S_PROBE_EXTRACT '1' | '0'     include patch extraction in the step

Timing via host fetch (tunnel does not sync on block_until_ready).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from points2surf_tpu.utils.jaxcfg import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from points2surf_tpu.models import losses as L
from points2surf_tpu.models.p2s import PointsToSurfModel
from points2surf_tpu.ops.patches import PatchConfig, extract_patches
from points2surf_tpu.ops.voxel import grid_query_points


def main():
    batch = int(os.environ.get("P2S_PROBE_BATCH", "1000"))
    iters = int(os.environ.get("P2S_PROBE_ITERS", "10"))
    dtype = jnp.bfloat16 if os.environ.get("P2S_PROBE_DTYPE") == "bf16" else None
    use_stn = os.environ.get("P2S_PROBE_STN", "1") == "1"
    fuse_extract = os.environ.get("P2S_PROBE_EXTRACT", "1") == "1"

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cloud_file = os.environ.get("P2S_PROBE_CLOUD") or os.path.join(
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

    cfg = PatchConfig(points_per_patch=300, patch_radius=0.0,
                      sub_sample_size=1000)
    model = PointsToSurfModel(
        net_size_max=1024, output_dim=2, use_point_stn=use_stn,
        use_feat_stn=use_stn, shared_transformation=use_stn, dtype=dtype,
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
    weights = {o: 1.0 for o in outputs}
    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(params)

    remat = os.environ.get("P2S_PROBE_REMAT", "")

    def apply_fn(p, bs, bt):
        return model.apply(
            {"params": p, "batch_stats": bs}, bt, True,
            mutable=["batch_stats"],
        )

    if remat:
        from points2surf_tpu.models.pointnet import CHAIN_BOUNDARY_NAMES

        policy = {
            "dots": jax.checkpoint_policies.dots_saveable,
            "nothing": jax.checkpoint_policies.nothing_saveable,
            # targeted: save only the annotated cheap chain boundaries
            # (pool outputs, rotated inputs); recompute the HBM-heavy
            # (B, n, 64/128) per-point interiors in the backward
            "names": jax.checkpoint_policies.save_only_these_names(
                *CHAIN_BOUNDARY_NAMES
            ),
        }[remat]
        apply_fn = jax.checkpoint(apply_fn, policy=policy)

    def loss_fn(p, bs, bt):
        pred, mutated = apply_fn(p, bs, bt)
        pred = pred.astype(jnp.float32)
        ll = L.compute_loss(pred, bt, outputs, weights, fixed_radius=False)
        return sum(ll), mutated["batch_stats"]

    @jax.jit
    def train_step(p, bs, opt, q, gt, key):
        if fuse_extract:
            bt = extract_patches(pts_dev, q, n, key, cfg=cfg, train=True)
        else:
            # fixed synthetic batch (costless extraction) to isolate model cost
            bt = {
                "patch_pts_ps": jnp.broadcast_to(
                    q[:, None, :] * 0.01, (q.shape[0], 300, 3)
                ),
                "pts_sub_sample_ms": jnp.broadcast_to(
                    q[:, None, :], (q.shape[0], 1000, 3)
                ),
                "imp_surf_query_point_ms": q,
                "patch_radius_ms": jnp.full((q.shape[0],), 0.05),
            }
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
        q = jnp.asarray(queries[(i * batch) % (len(queries) - batch):][:batch])
        return train_step(p, bs, opt, q, gt, jax.random.key(i))

    # rtt
    x = jnp.zeros((8,))
    float(jnp.sum(x))
    rtt = min(
        (lambda t0: (float(jnp.sum(x)), time.time() - t0)[1])(time.time())
        for _ in range(5)
    )

    p, bs, opt = params, batch_stats, opt_state
    t0 = time.time()
    p, bs, opt, loss = run(0, p, bs, opt)
    float(loss)
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(1, iters + 1):
        p, bs, opt, loss = run(i, p, bs, opt)
    float(loss)
    dt = max(time.time() - t0 - rtt, 1e-9)

    print(json.dumps({
        "ms_per_step": round(dt / iters * 1000, 1),
        "patches_per_sec": round(batch * iters / dt, 1),
        "batch": batch,
        "compile_s": round(compile_s, 1),
        "dtype": "bf16" if dtype else "f32",
        "stn": use_stn,
        "extract": fuse_extract,
        "loss": float(loss),
    }))


if __name__ == "__main__":
    main()
