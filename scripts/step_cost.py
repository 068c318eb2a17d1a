"""Print XLA cost analysis of the fused train step (no execution).

Compiles (persistent-cache-friendly) the exact probe_train/bench train
step and prints flops / bytes-accessed / estimated roofline times, to
locate whether the step is MXU- or HBM-bound and what materializes.
"""

import os
import sys

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
    weights = {o: 1.0 for o in outputs}
    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(p, bs, bt):
        pred, mutated = model.apply(
            {"params": p, "batch_stats": bs}, bt, True,
            mutable=["batch_stats"],
        )
        ll = L.compute_loss(pred, bt, outputs, weights, fixed_radius=False)
        return sum(ll), mutated["batch_stats"]

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

    q = jnp.zeros((batch, 3))
    gt = jnp.zeros((batch,))
    lowered = jax.jit(train_step).lower(
        params, batch_stats, opt_state, q, gt, jax.random.key(0)
    )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_hbm = ca.get("bytes accessed", float("nan"))
    print(f"flops               : {flops/1e12:.3f} TFLOP")
    print(f"bytes accessed      : {bytes_hbm/1e9:.3f} GB")
    # v5e: ~197 TFLOP/s bf16 MXU, ~819 GB/s HBM
    print(f"MXU-bound time @197T: {flops/197e12*1e3:.1f} ms")
    print(f"HBM-bound time @819G: {bytes_hbm/819e9*1e3:.1f} ms")
    for k in sorted(ca):
        if k.startswith("bytes accessed") and k != "bytes accessed":
            v = ca[k]
            if v > 1e9:
                print(f"  {k}: {v/1e9:.2f} GB")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"temp allocation     : "
              f"{getattr(mem, 'temp_size_in_bytes', 0)/1e9:.2f} GB")
        print(f"argument size       : "
              f"{getattr(mem, 'argument_size_in_bytes', 0)/1e9:.2f} GB")


if __name__ == "__main__":
    main()
