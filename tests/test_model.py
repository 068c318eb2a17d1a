import jax
import jax.numpy as jnp
import numpy as np
import pytest

from points2surf_tpu.models import losses
from points2surf_tpu.models.p2s import PointsToSurfModel
from points2surf_tpu.models.pointnet import QSTN, STN, PointNetFeat


def _batch(rng, b=4, p=32, s=48):
    return {
        "patch_pts_ps": jnp.asarray(rng.randn(b, p, 3).astype(np.float32)),
        "pts_sub_sample_ms": jnp.asarray(rng.randn(b, s, 3).astype(np.float32)),
        "imp_surf_query_point_ms": jnp.asarray(
            rng.randn(b, 3).astype(np.float32)
        ),
    }


def test_stn_near_identity_at_init(rng):
    m = STN(net_size_max=64, dim=3)
    x = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    variables = m.init(jax.random.key(0), x, False)
    out = m.apply(variables, x, False)
    assert out.shape == (2, 3, 3)
    # identity is added; output should be within a small band around it
    assert np.abs(np.asarray(out) - np.eye(3)).max() < 2.0


def test_qstn_outputs_rotation(rng):
    m = QSTN(net_size_max=64)
    x = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    variables = m.init(jax.random.key(0), x, False)
    rot, quat = m.apply(variables, x, False)
    r = np.asarray(rot)
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", r, r), np.tile(np.eye(3), (2, 1, 1)), atol=1e-4
    )
    assert quat.shape == (2, 4)


@pytest.mark.parametrize("sym_op", ["max", "sum"])
def test_pointnetfeat_shapes(rng, sym_op):
    m = PointNetFeat(net_size_max=64, output_size=64, sym_op=sym_op)
    x = jnp.asarray(rng.randn(3, 20, 3).astype(np.float32))
    variables = m.init(jax.random.key(0), x, False)
    feat, trans, quat, trans2 = m.apply(variables, x, False)
    assert feat.shape == (3, 64)
    assert trans.shape == (3, 3, 3)
    assert trans2.shape == (3, 64, 64)


def test_pointnetfeat_permutation_invariant(rng):
    m = PointNetFeat(
        net_size_max=64, output_size=64, use_point_stn=False,
        use_feat_stn=False,
    )
    x = np.asarray(rng.randn(2, 20, 3), np.float32)
    variables = m.init(jax.random.key(0), jnp.asarray(x), False)
    f1, *_ = m.apply(variables, jnp.asarray(x), False)
    perm = rng.permutation(20)
    f2, *_ = m.apply(variables, jnp.asarray(x[:, perm]), False)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


@pytest.mark.parametrize(
    "variant",
    ["vanilla", "shared_transformation", "single_transformer", "no_qstn"],
)
def test_p2s_model_variants(rng, variant):
    m = PointsToSurfModel(
        net_size_max=64,
        output_dim=2,
        use_point_stn=variant != "no_qstn",
        single_transformer=variant == "single_transformer",
        shared_transformation=variant == "shared_transformation",
    )
    batch = _batch(rng)
    variables = m.init(jax.random.key(0), batch, False)
    out = m.apply(variables, batch, False)
    assert out.shape == (4, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_p2s_train_mode_updates_batch_stats(rng):
    m = PointsToSurfModel(net_size_max=64, output_dim=2)
    batch = _batch(rng)
    variables = m.init(jax.random.key(0), batch, True)
    out, mutated = m.apply(
        variables, batch, True, mutable=["batch_stats"]
    )
    assert out.shape == (4, 2)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_losses_match_torch_semantics(rng):
    import torch
    import torch.nn.functional as F

    pred = rng.randn(64).astype(np.float32)
    target = rng.randn(64).astype(np.float32)
    sign_target = (rng.rand(64) > 0.5).astype(np.float32)

    got = float(losses.calc_loss_distance(jnp.asarray(pred), jnp.asarray(target)))
    want = float(
        F.mse_loss(torch.tanh(torch.from_numpy(pred)), torch.tanh(torch.from_numpy(target)))
    )
    assert abs(got - want) < 1e-6

    got = float(losses.calc_loss_magnitude(jnp.asarray(pred), jnp.asarray(target)))
    want = float(
        F.mse_loss(
            torch.tanh(torch.from_numpy(pred).abs()),
            torch.tanh(torch.from_numpy(target).abs()),
        )
    )
    assert abs(got - want) < 1e-6

    got = float(losses.calc_loss_sign(jnp.asarray(pred), jnp.asarray(sign_target)))
    want = float(
        F.binary_cross_entropy_with_logits(
            torch.from_numpy(pred), torch.from_numpy(sign_target)
        )
    )
    assert abs(got - want) < 1e-6


def test_postprocess(rng):
    pred = rng.randn(32).astype(np.float32)
    d = np.asarray(losses.post_process_distance(jnp.asarray(pred)))
    np.testing.assert_allclose(d, np.tanh(pred) ** 2 * np.sign(pred), atol=1e-6)
    m = np.asarray(losses.post_process_magnitude(jnp.asarray(pred)))
    np.testing.assert_allclose(m, np.tanh(pred) ** 2, atol=1e-6)
    s = np.asarray(losses.post_process_sign(jnp.asarray(pred)))
    assert set(np.unique(s)) <= {-1.0, 1.0}
    assert (s[pred >= 0] == 1.0).all()


def test_calc_metrics(rng):
    pred = jnp.asarray(rng.randn(64, 2).astype(np.float32))
    batch = {
        "imp_surf_magnitude_ms": jnp.asarray(
            np.abs(rng.randn(64, 1)).astype(np.float32)
        ),
        "imp_surf_dist_sign_ms": jnp.asarray(
            (rng.rand(64, 1) > 0.5).astype(np.float32)
        ),
    }
    m = losses.calc_metrics(("imp_surf_magnitude", "imp_surf_sign"), pred, batch)
    for k in ("abs_dist_rms", "accuracy", "precision", "recall", "f1_score"):
        assert k in m
    assert 0.0 <= float(m["accuracy"]) <= 1.0


@pytest.mark.parametrize("level", [1, 2])
def test_fused_tail_equivalence(rng, monkeypatch, level):
    """The fused linear->BN->(relu)->pool tail must be parameter-compatible
    and numerically equivalent to the literal layer stack: identical
    variable tree and init, bit-near eval forward, and matching train-mode
    forward/grads/batch-stats on an isolated trunk (full-model train
    comparisons amplify reassociation noise through the stacked STNs).
    Level 1 = fused reductions w/ autodiff backward; level 2 adds the
    hand-derived VJP."""
    import flax
    import points2surf_tpu.models.pointnet as pn

    x = jnp.asarray(rng.randn(8, 40, 64).astype(np.float32))

    def run(fused, sym_op="max"):
        fused = level if fused else 0
        monkeypatch.setattr(pn, "_FUSED_TAIL", fused)
        m = pn._STNTrunk(net_size_max=128, out_features=9)
        v = m.init(jax.random.key(0), x, True)

        def f(params):
            out, mut = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2), (out, mut)

        (_, (out, mut)), g = jax.value_and_grad(f, has_aux=True)(v["params"])
        ev = m.apply(v, x, False)
        return v, out, mut, g, ev

    v1, o1, m1, g1, e1 = run(False)
    v2, o2, m2, g2, e2 = run(True)

    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v1), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(m1), jax.tree_util.tree_leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    f1 = flax.traverse_util.flatten_dict(g1)
    f2 = flax.traverse_util.flatten_dict(g2)
    for k in f1:
        np.testing.assert_allclose(
            np.asarray(f1[k]), np.asarray(f2[k]), atol=2e-4,
            err_msg="/".join(k),
        )


@pytest.mark.parametrize("level", [1, 2])
def test_fused_tail_sum_pool_equivalence(rng, monkeypatch, level):
    """Same check for the sym_op='sum' encoder tail (affine commutes with
    the sum; n * shift term)."""
    import points2surf_tpu.models.pointnet as pn

    x = jnp.asarray(rng.randn(4, 24, 3).astype(np.float32))

    def run(fused):
        fused = level if fused else 0
        monkeypatch.setattr(pn, "_FUSED_TAIL", fused)
        m = PointNetFeat(net_size_max=64, output_size=64,
                         use_point_stn=False, use_feat_stn=False,
                         sym_op="sum")
        v = m.init(jax.random.key(1), x, True)
        tr, mut = m.apply(v, x, True, mutable=["batch_stats"])
        ev = m.apply(v, x, False)
        return v, tr[0], mut, ev[0]

    v1, t1, m1, e1 = run(False)
    v2, t2, m2, e2 = run(True)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(m1), jax.tree_util.tree_leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_covbn_equivalence(rng, monkeypatch):
    """The covariance-form interior layer (linear -> train-BN -> relu
    collapsed to one matmul via mean(y) = mean(x) @ W + b and
    var(y)_j = w_j^T Cov(x) w_j) must be parameter-compatible and
    numerically equivalent to the literal PLinear+BN stack: identical
    variable tree/init, matching train forward, grads, and batch-stats
    updates, and an untouched (literal) eval path."""
    import flax
    import points2surf_tpu.models.pointnet as pn

    x = jnp.asarray(rng.randn(6, 50, 64).astype(np.float32) * 0.7 + 0.3)

    def run(covbn):
        monkeypatch.setattr(pn, "_COVBN", covbn)
        m = pn._STNTrunk(net_size_max=128, out_features=9)
        v = m.init(jax.random.key(0), x, True)

        def f(params):
            out, mut = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2), (out, mut)

        (_, (out, mut)), g = jax.value_and_grad(f, has_aux=True)(v["params"])
        ev = m.apply(v, x, False)
        return v, out, mut, g, ev

    v1, o1, m1, g1, e1 = run(0)
    v2, o2, m2, g2, e2 = run(1)

    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v1), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(m1), jax.tree_util.tree_leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    f1 = flax.traverse_util.flatten_dict(g1)
    f2 = flax.traverse_util.flatten_dict(g2)
    for k in f1:
        np.testing.assert_allclose(
            np.asarray(f1[k]), np.asarray(f2[k]), atol=5e-4,
            err_msg="/".join(k),
        )


def test_covbn_full_model_train_step(rng, monkeypatch):
    """Full-model smoke: a train-mode forward/backward through
    PointsToSurfModel with the covariance-form layers stays finite and
    close to the literal stack (stacked STNs amplify reassociation noise,
    so the bound here is loose; the tight bound lives in
    test_covbn_equivalence)."""
    import points2surf_tpu.models.pointnet as pn

    batch = _batch(rng, b=8, p=24, s=32)

    def run(covbn):
        monkeypatch.setattr(pn, "_COVBN", covbn)
        m = PointsToSurfModel(net_size_max=128, output_dim=2,
                              use_point_stn=True, use_feat_stn=True,
                              shared_transformation=True)
        v = m.init(jax.random.key(0), batch, True)

        def f(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                batch, True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2)

        loss, g = jax.value_and_grad(f)(v["params"])
        gn = jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(g)))
        return float(loss), float(gn)

    l1, n1 = run(0)
    l2, n2 = run(1)
    assert np.isfinite(l2) and np.isfinite(n2)
    np.testing.assert_allclose(l2, l1, rtol=1e-3)
    np.testing.assert_allclose(n2, n1, rtol=1e-2)


def test_eval_tail_bf16_lever(rng, monkeypatch):
    """P2S_EVAL_TAIL_BF16 (eval-throughput lever): runs ONLY the trunk-tail
    matmuls (~90% of forward FLOPs, docs/PERFORMANCE.md round 5) with bf16
    operands + f32 accumulation at eval. Engagement is proven by the
    outputs differing bit-wise from the f32 path while staying within
    bf16-rounding distance; train mode and explicit-bf16 models are
    untouched."""
    batch = {
        "patch_pts_ps": jnp.asarray(rng.randn(4, 30, 3).astype(np.float32)),
        "pts_sub_sample_ms": jnp.asarray(
            rng.randn(4, 50, 3).astype(np.float32)
        ),
        "imp_surf_query_point_ms": jnp.asarray(
            rng.randn(4, 3).astype(np.float32)
        ),
    }
    m = PointsToSurfModel(net_size_max=128, output_dim=2,
                          shared_transformation=True)
    v = m.init(jax.random.key(0), batch, False)

    monkeypatch.delenv("P2S_EVAL_TAIL_BF16", raising=False)
    base = np.asarray(m.apply(v, batch, False))
    monkeypatch.setenv("P2S_EVAL_TAIL_BF16", "1")
    lever = np.asarray(m.apply(v, batch, False))
    tr_base, tr_mut = m.apply(v, batch, True, mutable=["batch_stats"])

    assert not np.array_equal(base, lever)  # the bf16 dots engaged
    np.testing.assert_allclose(lever, base, rtol=0.05, atol=0.05)

    # train mode must be bit-identical with the lever set (eval-only)
    monkeypatch.delenv("P2S_EVAL_TAIL_BF16")
    tr_off, _ = m.apply(v, batch, True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(tr_base), np.asarray(tr_off))
