"""Stage-level decomposition + roofline bounds for the fused train step.

ROADMAP item 5's done-bar: f32 step <= 100 ms at batch 1000 (>= 10k pps)
OR a step-level roofline note proving ~117 ms is bound. This probe
times, on the real chip (host-fetch sync, rtt-subtracted):

  extract      — extract_patches only (the in-step data path)
  fwd_loss     — train-mode forward + loss (no grad)
  grad         — value_and_grad of fwd_loss (fwd + bwd)
  step         — full production step (extract + grad + SGD update)

and prints XLA cost analysis (FLOPs / bytes, f32-MXU / bf16-MXU / HBM
bounds) per program. Caveat: the Pallas train-tail custom calls are
opaque to cost_analysis — their FLOPs/bytes are UNDERCOUNTED in `grad`
and `step`; the printed delta vs the XLA-fallback program
(P2S_PALLAS_TAIL=0) bounds that gap.

Run: python scripts/train_roofline.py (P2S_PROBE_BATCH, P2S_PROBE_CLOUD
override batch / cloud padding bucket).
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
import optax

from points2surf_tpu.models import losses as L
from points2surf_tpu.models.p2s import PointsToSurfModel
from points2surf_tpu.ops.patches import PatchConfig, extract_patches
from points2surf_tpu.ops.voxel import grid_query_points

PEAK_BF16, PEAK_F32, PEAK_HBM = 197e12, 99e12, 819e9


def _report(name, compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    gb = ca.get("bytes accessed", float("nan"))
    print(f"[{name}] {flops/1e12:.4f} TFLOP, {gb/1e9:.3f} GB | bounds: "
          f"f32-MXU {flops/PEAK_F32*1e3:.1f} ms, "
          f"bf16-MXU {flops/PEAK_BF16*1e3:.1f} ms, "
          f"HBM {gb/PEAK_HBM*1e3:.1f} ms")


def _rtt():
    x = jnp.zeros((8,))
    float(jnp.sum(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(x))
        best = min(best, time.time() - t0)
    return best


def _leaf_sync(tree):
    return float(jnp.sum(jax.tree_util.tree_leaves(tree)[0]))


def _time(fn, rtt, iters=10):
    _leaf_sync(fn())  # warm / compile
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    _leaf_sync(out)  # in-order stream: syncing the last syncs all
    return (time.time() - t0 - rtt) / iters


def main():
    batch = int(os.environ.get("P2S_PROBE_BATCH", "1000"))
    bucket = int(os.environ.get("P2S_PROBE_CLOUD", "16384"))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cloud_file = os.path.join(
        root, "datasets/abc_minimal/04_pts",
        "00011084_fddd53ce45f640f3ab922328_trimesh_019.xyz.npy",
    )
    pts = np.load(cloud_file)[:, :3].astype(np.float32)
    n = pts.shape[0]
    n_pad = -(-n // bucket) * bucket
    padded = np.zeros((n_pad, 3), np.float32)
    padded[:n] = pts
    pts_dev = jnp.asarray(padded)
    _ = grid_query_points(pts, 8, 3)  # touch the helper (parity w/ probes)

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
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.key(0), dummy, True
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    outputs = ("imp_surf_magnitude", "imp_surf_sign")
    weights = {o: 1.0 for o in outputs}
    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(batch, 3).astype(np.float32) * 0.3)
    gt = jnp.asarray(rng.randn(batch).astype(np.float32) * 0.1)
    key = jax.random.key(1)

    def fill_gt(bt):
        bt = dict(bt)
        bt["imp_surf_ms"] = gt
        bt["imp_surf_magnitude_ms"] = jnp.abs(gt)
        bt["imp_surf_dist_sign_ms"] = (gt >= 0.0).astype(jnp.float32)
        return bt

    def loss_fn(p, bs, bt):
        pred, mutated = model.apply(
            {"params": p, "batch_stats": bs}, bt, True,
            mutable=["batch_stats"],
        )
        ll = L.compute_loss(pred, bt, outputs, weights, fixed_radius=False)
        return sum(ll), mutated["batch_stats"]

    def extract_only(qq, k):
        return extract_patches(pts_dev, qq, n, k, cfg=cfg, train=True)

    def fwd_loss(p, bs, qq, k):
        bt = fill_gt(extract_only(qq, k))
        l, _ = loss_fn(p, bs, bt)
        return l

    def grad_fn(p, bs, qq, k):
        bt = fill_gt(extract_only(qq, k))
        (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, bt)
        return l, g

    def train_step(p, bs, opt, qq, ggt, k):
        bt = fill_gt(extract_only(qq, k))
        (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, bt)
        updates, opt = tx.update(g, opt, p)
        p = optax.apply_updates(p, updates)
        return p, new_bs, opt, l

    rtt = _rtt()
    print(f"batch {batch}, cloud bucket {n_pad}, rtt {rtt*1e3:.1f} ms")
    results = {}

    progs = [
        ("extract", lambda: jax.jit(extract_only)(q, key),
         jax.jit(extract_only).lower(q, key)),
        ("fwd_loss", lambda: jax.jit(fwd_loss)(params, batch_stats, q, key),
         jax.jit(fwd_loss).lower(params, batch_stats, q, key)),
        ("grad", lambda: jax.jit(grad_fn)(params, batch_stats, q, key),
         jax.jit(grad_fn).lower(params, batch_stats, q, key)),
        ("step", lambda: jax.jit(train_step)(
            params, batch_stats, opt_state, q, gt, key),
         jax.jit(train_step).lower(
             params, batch_stats, opt_state, q, gt, key)),
    ]
    for name, fn, lowered in progs:
        compiled = lowered.compile()
        _report(name, compiled)
        n_pallas = compiled.as_text().count("tpu_custom_call")
        if n_pallas:
            print(f"  [{name}] {n_pallas} tpu_custom_call sites "
                  "(FLOPs/bytes undercounted by cost_analysis)")
        results[name] = _time(fn, rtt)

    print(f"\ntimed (batch {batch}):")
    for k, v in results.items():
        print(f"  {k:10s}: {v*1e3:8.2f} ms")
    print(f"  {'bwd (grad - fwd_loss)':22s}: "
          f"{(results['grad'] - results['fwd_loss'])*1e3:8.2f} ms")
    print(f"  {'opt (step - grad)':22s}: "
          f"{(results['step'] - results['grad'])*1e3:8.2f} ms")
    print(f"  {'fwd-only (fwd_loss - extract)':30s}: "
          f"{(results['fwd_loss'] - results['extract'])*1e3:8.2f} ms")
    pps = batch / results["step"]
    print(f"  step -> {pps:,.0f} patches/s")


if __name__ == "__main__":
    main()
