"""Decompose the eval forward (61 ms/batch at 4096, docs/PERFORMANCE.md
round 4) into its stages, and A/B the precision levers.

The round-4 note compared the f32 forward against the 197 TFLOP/s bf16
MXU peak; the f32 peak is ~half that, so the first question is what the
honest roofline is. This probe compiles + times (host-fetch, rtt-
subtracted):

  forward/f32          — production eval forward (query_cost.py's config)
  forward/tail-bf16    — P2S_EVAL_TAIL_BF16=1 (bf16 dots ONLY in the five
                         trunk tails, f32 accumulate; geometry stays f32)
  forward/bf16         — full model dtype=bf16 (--eval_dtype bfloat16)
  qstn                 — point_stn on the concatenated (B, 1300, 3) sets
  feat_global          — global encoder on (B, 1000, 3)
  feat_local           — local encoder on (B, 300, 3)
  heads                — fc1_*/fc2/fc3/fc4 MLP on pooled codewords

Stage timings sum to ~the full forward when nothing is layout-bound;
a gap is dispatch/reshape overhead. XLA cost analysis (FLOPs + bytes)
prints per program with f32 AND bf16 MXU bounds so the roofline claim
is apples-to-apples. Run on the real chip: python scripts/forward_cost.py
(P2S_PROBE_BATCH overrides the batch).
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

from points2surf_tpu.models.p2s import PointsToSurfModel
from points2surf_tpu.models.pointnet import QSTN, BN, PLinear, PointNetFeat

# v5e peaks: bf16 MXU ~197 TFLOP/s, f32 ~99 TFLOP/s, HBM ~819 GB/s
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


def _time(fn, rtt, iters=10):
    float(jnp.sum(fn()))  # warm / compile
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    float(jnp.sum(out))  # in-order stream: syncing the last syncs all
    return (time.time() - t0 - rtt) / iters


def main():
    batch = int(os.environ.get("P2S_PROBE_BATCH", "4096"))
    rng = np.random.RandomState(0)
    bt = {
        "patch_pts_ps": jnp.asarray(
            rng.randn(batch, 300, 3).astype(np.float32)
        ),
        "pts_sub_sample_ms": jnp.asarray(
            rng.randn(batch, 1000, 3).astype(np.float32)
        ),
        "imp_surf_query_point_ms": jnp.asarray(
            rng.randn(batch, 3).astype(np.float32)
        ),
        "patch_radius_ms": jnp.ones((batch,)),
    }

    def build(dtype=None):
        m = PointsToSurfModel(
            net_size_max=1024, output_dim=2, use_point_stn=True,
            use_feat_stn=True, shared_transformation=True, dtype=dtype,
        )
        # jit the init: eager init dispatches each layer's op as its own
        # remote compile at batch 4096, which is slow through the tunnel
        # and has hit transient remote-compile HTTP 500s
        v = jax.jit(m.init, static_argnums=2)(jax.random.key(0), bt, True)
        return m, v["params"], v.get("batch_stats", {})

    model, params, bstats = build()

    def fwd(p, bs, b_in):
        from points2surf_tpu.models import losses as L

        pred = model.apply({"params": p, "batch_stats": bs}, b_in, False)
        mag = L.post_process_magnitude(pred[:, 0]) * b_in["patch_radius_ms"]
        return mag * L.post_process_sign(pred[:, 1])

    rtt = _rtt()
    print(f"batch {batch}, rtt {rtt*1e3:.1f} ms")
    results = {}

    # --- full forward variants -----------------------------------------
    for name, env in (("forward/f32", "0"), ("forward/tail-bf16", "1")):
        os.environ["P2S_EVAL_TAIL_BF16"] = env
        c = jax.jit(fwd).lower(params, bstats, bt).compile()
        _report(name, c)
        results[name] = _time(lambda: jax.jit(fwd)(params, bstats, bt), rtt)
    os.environ["P2S_EVAL_TAIL_BF16"] = "0"

    # --- fused eval-chain kernel (P2S_EVAL_CHAIN) ------------------------
    os.environ["P2S_EVAL_CHAIN"] = "1"
    jax.clear_caches()  # trace-time gate
    c = jax.jit(fwd).lower(params, bstats, bt).compile()
    n_pallas = c.as_text().count("tpu_custom_call")
    _report("forward/chain", c)
    print(f"  [forward/chain] {n_pallas} tpu_custom_call sites "
          "(expect 5: qstn + 2x stn2 + 2 encoder tails)")
    results["forward/chain"] = _time(
        lambda: jax.jit(fwd)(params, bstats, bt), rtt
    )
    # numeric A/B vs the literal forward (same batch): bf16-grade expected
    chain_out = np.asarray(jax.jit(fwd)(params, bstats, bt))
    os.environ["P2S_EVAL_CHAIN"] = "0"
    jax.clear_caches()
    lit_out = np.asarray(jax.jit(fwd)(params, bstats, bt))
    denom = np.abs(lit_out).mean() + 1e-9
    print(f"  [forward/chain] vs literal: mean|d| "
          f"{np.abs(chain_out - lit_out).mean() / denom:.3e} (rel), max|d| "
          f"{np.abs(chain_out - lit_out).max():.3e}")

    m16, p16, bs16 = build(jnp.bfloat16)

    def fwd16(p, bs, b_in):
        from points2surf_tpu.models import losses as L

        pred = m16.apply({"params": p, "batch_stats": bs}, b_in, False)
        mag = L.post_process_magnitude(pred[:, 0]) * b_in["patch_radius_ms"]
        return mag * L.post_process_sign(pred[:, 1])

    c = jax.jit(fwd16).lower(p16, bs16, bt).compile()
    _report("forward/bf16", c)
    results["forward/bf16"] = _time(
        lambda: jax.jit(fwd16)(p16, bs16, bt), rtt
    )

    # --- stages (f32) ----------------------------------------------------
    qstn = QSTN(1024)
    both = jnp.concatenate([bt["patch_pts_ps"], bt["pts_sub_sample_ms"]],
                           axis=1)

    def qstn_fn(p, bs):
        r, _ = qstn.apply({"params": p, "batch_stats": bs}, both, False)
        return jnp.sum(r)

    qp = {"trunk": params["point_stn"]["trunk"]}
    qb = {"trunk": bstats["point_stn"]["trunk"]}
    c = jax.jit(qstn_fn).lower(qp, qb).compile()
    _report("qstn", c)
    results["qstn"] = _time(lambda: jax.jit(qstn_fn)(qp, qb), rtt)

    feat = PointNetFeat(net_size_max=1024, output_size=1024,
                        use_point_stn=False, use_feat_stn=True)
    for name, key, x in (
        ("feat_global", "feat_global", bt["pts_sub_sample_ms"]),
        ("feat_local", "feat_local", bt["patch_pts_ps"]),
    ):
        fp, fb = params[key], bstats[key]

        def feat_fn(p, bs, xx):
            h, _, _, _ = feat.apply({"params": p, "batch_stats": bs},
                                    xx, False)
            return jnp.sum(h)

        c = jax.jit(feat_fn).lower(fp, fb, x).compile()
        _report(name, c)
        results[name] = _time(
            lambda f=feat_fn, a=fp, b=fb, xx=x: jax.jit(f)(a, b, xx), rtt
        )

    # --- heads on pooled codewords ---------------------------------------
    import flax.linen as nn

    class _Heads(nn.Module):
        @nn.compact
        def __call__(self, g, l):
            g = nn.relu(BN(name="bn1_global")(
                PLinear(512, name="fc1_global")(g), False))
            l = nn.relu(BN(name="bn1_local")(
                PLinear(512, name="fc1_local")(l), False))
            h = jnp.concatenate([l, g], axis=1)
            h = nn.relu(BN(name="bn2")(PLinear(256, name="fc2")(h), False))
            h = nn.relu(BN(name="bn3")(PLinear(128, name="fc3")(h), False))
            return jnp.sum(PLinear(2, name="fc4")(h))

    heads = _Heads()
    g_in = jnp.asarray(rng.randn(batch, 1024).astype(np.float32))
    l_in = jnp.asarray(rng.randn(batch, 1024).astype(np.float32))
    hp = {k: params[k] for k in
          ("fc1_global", "bn1_global", "fc1_local", "bn1_local",
           "fc2", "bn2", "fc3", "bn3", "fc4")}
    hb = {k: bstats[k] for k in
          ("bn1_global", "bn1_local", "bn2", "bn3")}

    def heads_fn(p, bs, g, l):
        return heads.apply({"params": p, "batch_stats": bs}, g, l)

    c = jax.jit(heads_fn).lower(hp, hb, g_in, l_in).compile()
    _report("heads", c)
    results["heads"] = _time(
        lambda: jax.jit(heads_fn)(hp, hb, g_in, l_in), rtt
    )

    print(f"\ntimed (batch {batch}):")
    for k, v in results.items():
        print(f"  {k:20s}: {v*1e3:8.2f} ms/batch")
    stage_sum = sum(results[k] for k in
                    ("qstn", "feat_global", "feat_local", "heads"))
    print(f"  {'stage sum':20s}: {stage_sum*1e3:8.2f} ms "
          f"(vs forward/f32 {results['forward/f32']*1e3:.2f}; gap = "
          "rotations + concat/reshape + dispatch)")


if __name__ == "__main__":
    main()
