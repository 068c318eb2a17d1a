import jax
import jax.numpy as jnp
import numpy as np
import pytest

from points2surf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from points2surf_tpu.parallel.sharding import partition_params


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] <= len(jax.devices())
    mesh2 = make_mesh(model=2)
    assert mesh2.shape["model"] == 2


def test_shard_batch_divisible():
    mesh = make_mesh()
    n = mesh.shape["data"]
    batch = {"x": jnp.zeros((n * 4, 7, 3)), "y": jnp.zeros((n * 4,))}
    out = shard_batch(batch, mesh)
    assert "data" in str(out["x"].sharding.spec)


def test_shard_batch_ragged_falls_back():
    mesh = make_mesh()
    batch = {"x": jnp.zeros((3, 7, 3))}
    out = shard_batch(batch, mesh)  # 3 not divisible by 8
    assert out["x"].shape == (3, 7, 3)


def test_partition_params_tp():
    mesh = make_mesh(model=2)
    params = {
        "wide": {"kernel": jnp.zeros((128, 512)), "bias": jnp.zeros((512,))},
        "narrow": {"kernel": jnp.zeros((16, 16)), "bias": jnp.zeros((16,))},
    }
    out = partition_params(params, mesh, min_dim=512)
    assert "model" in str(out["wide"]["kernel"].sharding.spec)
    assert "model" in str(out["wide"]["bias"].sharding.spec)
    assert "model" not in str(out["narrow"]["kernel"].sharding.spec)


def test_dryrun_multichip_entrypoints():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(len(jax.devices()))


def test_entry_forward_compiles():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry2",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_train_step_matches_single_device():
    """DP-sharded gradient step must equal the unsharded one."""
    import optax

    from points2surf_tpu.models import losses as L
    from points2surf_tpu.models.p2s import PointsToSurfModel

    # no max-pool anywhere (sum pooling, no STNs): near-tied max winners
    # flip under sharded-BN accumulation reordering and cascade through the
    # regressed rotation, making single-step bitwise comparison meaningless
    # for the full model (its loss still matches; see assertion below)
    model = PointsToSurfModel(
        net_size_max=64, output_dim=2, sym_op="sum",
        use_point_stn=False, use_feat_stn=False,
    )
    rng = np.random.RandomState(0)
    b = 16
    batch = {
        "patch_pts_ps": jnp.asarray(rng.randn(b, 16, 3).astype(np.float32)),
        "pts_sub_sample_ms": jnp.asarray(
            rng.randn(b, 24, 3).astype(np.float32)
        ),
        "imp_surf_query_point_ms": jnp.asarray(
            rng.randn(b, 3).astype(np.float32)
        ),
        "patch_radius_ms": jnp.full((b,), 0.2, jnp.float32),
        "imp_surf_ms": jnp.asarray(rng.randn(b).astype(np.float32) * 0.1),
        "imp_surf_magnitude_ms": jnp.asarray(
            np.abs(rng.randn(b)).astype(np.float32) * 0.1
        ),
        "imp_surf_dist_sign_ms": jnp.asarray(
            (rng.rand(b) > 0.5).astype(np.float32)
        ),
    }
    variables = model.init(jax.random.key(0), batch, True)
    tx = optax.sgd(0.01, momentum=0.9)
    outputs = ("imp_surf_magnitude", "imp_surf_sign")
    weights = {k: 1.0 for k in outputs}

    def loss_fn(p, bs, bt):
        pred, mut = model.apply(
            {"params": p, "batch_stats": bs}, bt, True,
            mutable=["batch_stats"],
        )
        return sum(L.compute_loss(pred, bt, outputs, weights, False)), mut

    @jax.jit
    def step(p, bs, opt, bt):
        (loss, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, bt)
        up, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, up), loss

    # single device
    p1, l1 = step(variables["params"], variables["batch_stats"],
                  tx.init(variables["params"]), batch)

    # sharded
    mesh = make_mesh()
    pr = replicate(variables["params"], mesh)
    bsr = replicate(variables["batch_stats"], mesh)
    optr = tx.init(pr)
    bt = shard_batch(batch, mesh)
    p2, l2 = step(pr, bsr, optr, bt)

    assert abs(float(l1) - float(l2)) < 1e-5
    all_diffs = np.concatenate(
        [
            np.abs(np.asarray(a) - np.asarray(b_)).ravel()
            for a, b_ in zip(
                jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
            )
        ]
    )
    assert all_diffs.max() < 1e-4
    assert all_diffs.mean() < 1e-6


def test_sharded_sdf_query_matches_single_device(rng):
    """Multi-chip reconstruction sweep: sharding the query batch over the
    mesh must not change the distances."""
    from points2surf_tpu.infer.query import make_sdf_query_fn
    from points2surf_tpu.models.p2s import PointsToSurfModel
    from points2surf_tpu.ops.patches import PatchConfig

    pts = np.zeros((2048, 3), np.float32)
    pts[:2000] = rng.rand(2000, 3).astype(np.float32) - 0.5
    q = rng.rand(64, 3).astype(np.float32) - 0.5
    cfg = PatchConfig(points_per_patch=32, sub_sample_size=48, exact=True)
    model = PointsToSurfModel(net_size_max=64, output_dim=2)
    dummy = {
        "patch_pts_ps": jnp.zeros((2, 32, 3)),
        "pts_sub_sample_ms": jnp.zeros((2, 48, 3)),
        "imp_surf_query_point_ms": jnp.zeros((2, 3)),
    }
    v = model.init(jax.random.key(0), dummy, False)
    outputs = ("imp_surf_magnitude", "imp_surf_sign")

    f1 = make_sdf_query_fn(model, outputs, cfg, fixed_radius=False)
    f2 = make_sdf_query_fn(model, outputs, cfg, fixed_radius=False,
                           mesh=make_mesh())
    key = jax.random.key(3)
    d1 = np.asarray(f1(v["params"], v["batch_stats"], jnp.asarray(pts),
                       jnp.asarray(q), 2000, key))
    d2 = np.asarray(f2(v["params"], v["batch_stats"], jnp.asarray(pts),
                       jnp.asarray(q), 2000, key))
    np.testing.assert_allclose(d1, d2, atol=2e-5, rtol=1e-3)
