import jax
import jax.numpy as jnp
import numpy as np

from points2surf_tpu.ops.subsample import subsample_batch


def _dist_prob(pts, query):
    """Numpy oracle of the reference dist_prob (utils.py:200-208)."""
    d = np.linalg.norm(pts - query, axis=1)
    dn = d / d.max()
    p = np.clip(1.0 - 1.5 * dn, 0.05, 1.0)
    return p / p.sum()


def test_uniform_subsample_in_range(rng):
    pts = rng.randn(1000, 3).astype(np.float32)
    q = rng.randn(4, 3).astype(np.float32)
    out = subsample_batch(
        jnp.asarray(pts), jnp.asarray(q), 1000, 64, jax.random.key(0),
        mode="uniform", chunk=256,
    )
    out = np.asarray(out)
    assert out.shape == (4, 64, 3)
    # every sampled row must be an actual point
    flat = out.reshape(-1, 3)
    d = np.linalg.norm(flat[:, None, :] - pts[None, :500, :], axis=-1).min(1)
    d2 = np.linalg.norm(flat[:, None, :] - pts[None, 500:, :], axis=-1).min(1)
    assert (np.minimum(d, d2) < 1e-6).all()


def test_dist_weighted_matches_reference_distribution(rng):
    """Gumbel-top-k must reproduce numpy.choice(replace=False, p=dist_prob)."""
    pts = rng.rand(400, 3).astype(np.float32)
    q = np.array([[0.5, 0.5, 0.5]], np.float32)
    n = 40
    counts = np.zeros(400)
    trials = 400
    for t in range(trials):
        out_ids_pts = subsample_batch(
            jnp.asarray(pts), jnp.asarray(q), 400, n, jax.random.key(t),
            mode="dist_weighted", chunk=128,
        )
        sel = np.asarray(out_ids_pts)[0]
        # recover indices by nearest match
        d = np.linalg.norm(sel[:, None, :] - pts[None], axis=-1)
        counts[d.argmin(1)] += 1
    emp = counts / counts.sum()

    # reference empirical distribution
    ref_counts = np.zeros(400)
    ref_rng = np.random.RandomState(7)
    p = _dist_prob(pts, q[0])
    for t in range(trials):
        ref_counts[ref_rng.choice(400, size=n, replace=False, p=p)] += 1
    ref_emp = ref_counts / ref_counts.sum()

    # close points should be drawn much more often than far ones, and the
    # two empirical distributions should correlate strongly
    corr = np.corrcoef(emp, ref_emp)[0, 1]
    assert corr > 0.9


def test_small_cloud_zero_pads(rng):
    pts = np.zeros((64, 3), np.float32)
    pts[:10] = rng.randn(10, 3)
    q = rng.randn(2, 3).astype(np.float32)
    out = np.asarray(
        subsample_batch(
            jnp.asarray(pts), jnp.asarray(q), 10, 16, jax.random.key(0),
            mode="dist_weighted", small_cloud=True, chunk=32,
        )
    )
    # each valid point exactly once, remaining rows zero
    for b in range(2):
        nonzero = out[b][np.abs(out[b]).sum(1) > 0]
        assert nonzero.shape[0] == 10
        assert (np.abs(out[b]).sum(1) == 0).sum() == 6


def test_fixed_key_is_deterministic(rng):
    pts = rng.randn(500, 3).astype(np.float32)
    q = rng.randn(3, 3).astype(np.float32)
    a = subsample_batch(
        jnp.asarray(pts), jnp.asarray(q), 500, 32, jax.random.key(42),
        mode="dist_weighted", chunk=128,
    )
    b = subsample_batch(
        jnp.asarray(pts), jnp.asarray(q), 500, 32, jax.random.key(42),
        mode="dist_weighted", chunk=128,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
