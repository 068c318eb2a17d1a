import jax
import jax.numpy as jnp
import numpy as np

from points2surf_tpu.ops import geometry


def quat_to_rotmat_oracle(q):
    """Numpy oracle of the reference batch_quat_to_rotmat (utils.py:13-46)."""
    q = np.asarray(q, np.float64)
    out = np.zeros(q.shape[:-1] + (3, 3))
    s = 2.0 / np.sum(q * q, -1)
    h = np.einsum("...i,...j->...ij", q, q)
    out[..., 0, 0] = 1 - (h[..., 2, 2] + h[..., 3, 3]) * s
    out[..., 0, 1] = (h[..., 1, 2] - h[..., 3, 0]) * s
    out[..., 0, 2] = (h[..., 1, 3] + h[..., 2, 0]) * s
    out[..., 1, 0] = (h[..., 1, 2] + h[..., 3, 0]) * s
    out[..., 1, 1] = 1 - (h[..., 1, 1] + h[..., 3, 3]) * s
    out[..., 1, 2] = (h[..., 2, 3] - h[..., 1, 0]) * s
    out[..., 2, 0] = (h[..., 1, 3] - h[..., 2, 0]) * s
    out[..., 2, 1] = (h[..., 2, 3] + h[..., 1, 0]) * s
    out[..., 2, 2] = 1 - (h[..., 1, 1] + h[..., 2, 2]) * s
    return out


def test_quat_to_rotmat_matches_oracle(rng):
    q = rng.randn(32, 4).astype(np.float32)
    got = np.asarray(geometry.quat_to_rotmat(jnp.asarray(q)))
    want = quat_to_rotmat_oracle(q)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_identity():
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(geometry.quat_to_rotmat(q)), np.eye(3), atol=1e-6
    )


def test_rotmat_is_orthonormal(rng):
    q = rng.randn(16, 4).astype(np.float32)
    r = np.asarray(geometry.quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(r), np.ones(16), atol=1e-4)


def test_random_rotation_uniform_mean():
    key = jax.random.key(0)
    r = np.asarray(geometry.random_rotation(key, (4096,)))
    # uniform rotations average to the zero matrix
    assert np.abs(r.mean(axis=0)).max() < 0.05
    np.testing.assert_allclose(np.linalg.det(r), np.ones(4096), atol=1e-4)


def test_patch_space_roundtrip(rng):
    pts = rng.randn(8, 20, 3).astype(np.float32)
    center = rng.randn(8, 3).astype(np.float32)
    radius = rng.rand(8).astype(np.float32) + 0.5
    ps = geometry.model_space_to_patch_space(
        jnp.asarray(pts), jnp.asarray(center), jnp.asarray(radius)
    )
    back = geometry.patch_space_to_model_space(
        ps, jnp.asarray(center), jnp.asarray(radius)
    )
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)


def test_patch_radii(rng):
    pts = rng.randn(4, 50, 3).astype(np.float32)
    q = rng.randn(4, 3).astype(np.float32)
    got = np.asarray(geometry.patch_radii(jnp.asarray(pts), jnp.asarray(q)))
    want = np.linalg.norm(pts - q[:, None, :], axis=-1).max(axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
