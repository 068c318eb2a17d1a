import jax
import jax.numpy as jnp
import numpy as np
from scipy import spatial

from points2surf_tpu.ops.knn import knn, patch_select


def test_knn_matches_kdtree(rng):
    pts = rng.randn(5000, 3).astype(np.float32)
    q = rng.randn(17, 3).astype(np.float32)
    k = 32
    ids, dists, pad = knn(jnp.asarray(pts), jnp.asarray(q), 5000, k, chunk=1024)
    tree = spatial.cKDTree(pts)
    ref_d, ref_i = tree.query(q, k)
    assert not np.asarray(pad).any()
    np.testing.assert_allclose(np.asarray(dists), ref_d, rtol=1e-4, atol=1e-5)
    # distances ascending
    d = np.asarray(dists)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    # same neighbor sets (ids may differ under distance ties)
    assert (np.sort(np.asarray(ids), 1) == np.sort(ref_i, 1)).mean() > 0.999


def test_knn_respects_valid_count(rng):
    pts = rng.randn(256, 3).astype(np.float32)
    pts[100:] = 0.0  # padding rows at the origin
    q = np.array([[0.0, 0.0, 0.0]], np.float32)
    ids, dists, pad = knn(jnp.asarray(pts), jnp.asarray(q), 100, 8, chunk=64)
    assert (np.asarray(ids) < 100).all()
    assert not np.asarray(pad).any()


def test_knn_small_cloud_pads(rng):
    pts = rng.randn(64, 3).astype(np.float32)
    q = rng.randn(3, 3).astype(np.float32)
    ids, dists, pad = knn(jnp.asarray(pts), jnp.asarray(q), 5, 8, chunk=64)
    assert np.asarray(pad).sum() == 3 * 3  # 8 requested, 5 valid
    assert (np.asarray(ids)[~np.asarray(pad)] < 5).all()


def test_ball_mode_selects_within_radius(rng):
    pts = rng.rand(2048, 3).astype(np.float32)
    q = np.full((4, 3), 0.5, np.float32)
    r = 0.15
    ids, sqd, pad = patch_select(
        jnp.asarray(pts),
        jnp.asarray(q),
        2048,
        k=16,
        radius=r,
        key=jax.random.key(1),
        chunk=512,
        use_ball=True,
    )
    ids, sqd, pad = map(np.asarray, (ids, sqd, pad))
    d = np.linalg.norm(pts[ids] - q[:, None, :], axis=-1)
    assert (d[~pad] <= r + 1e-6).all()
    np.testing.assert_allclose(np.sqrt(sqd[~pad]), d[~pad], atol=1e-5)
    # no duplicate selections per query
    for row, prow in zip(ids, pad):
        sel = row[~prow]
        assert len(set(sel.tolist())) == len(sel)


def test_ball_mode_is_uniform_subset(rng):
    """Top-k of uniform keys must pick a uniformly random in-ball subset."""
    pts = rng.rand(512, 3).astype(np.float32)
    q = np.full((1, 3), 0.5, np.float32)
    r = 0.3
    in_ball = np.nonzero(np.linalg.norm(pts - q, axis=1) <= r)[0]
    assert len(in_ball) > 40
    counts = np.zeros(512)
    n_trials = 300
    for t in range(n_trials):
        ids, _, pad = patch_select(
            jnp.asarray(pts),
            jnp.asarray(q),
            512,
            k=8,
            radius=r,
            key=jax.random.key(t),
            chunk=128,
            use_ball=True,
        )
        counts[np.asarray(ids)[0][~np.asarray(pad)[0]]] += 1
    sel_prob = counts[in_ball] / n_trials
    expected = 8.0 / len(in_ball)
    assert abs(sel_prob.mean() - expected) < 0.2 * expected
    out_ball = np.setdiff1d(np.arange(512), in_ball)
    assert counts[out_ball].sum() == 0
