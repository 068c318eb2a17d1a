"""Pure-JAX geometry primitives.

TPU-native equivalents of the numpy/torch helpers in the reference's
source/base/utils.py. Everything here is shape-polymorphic pure JAX, usable
inside jit/pjit/vmap and on any backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Convert (possibly unnormalized) quaternions to rotation matrices.

    Quaternions are given as ``[w, x, y, z]`` (Hamilton convention). The
    conversion normalizes implicitly via ``s = 2 / |q|^2``, matching the
    reference's ``batch_quat_to_rotmat`` (source/base/utils.py:13-46).

    Args:
      q: (..., 4) quaternions.

    Returns:
      (..., 3, 3) rotation matrices.
    """
    s = 2.0 / jnp.sum(q * q, axis=-1)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - (y * y + z * z) * s
    r01 = (x * y - z * w) * s
    r02 = (x * z + y * w) * s
    r10 = (x * y + z * w) * s
    r11 = 1.0 - (x * x + z * z) * s
    r12 = (y * z - x * w) * s
    r20 = (x * z - y * w) * s
    r21 = (y * z + x * w) * s
    r22 = 1.0 - (x * x + y * y) * s
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def random_quaternion(key: jax.Array, shape=()) -> jax.Array:
    """Uniform random unit quaternions (Shoemake's method), [w, x, y, z].

    Equivalent in distribution to trimesh.transformations.random_quaternion,
    which the reference uses for per-sample rotation augmentation
    (source/data_loader.py:381-393).
    """
    u = jax.random.uniform(key, shape + (3,))
    u1, u2, u3 = u[..., 0], u[..., 1], u[..., 2]
    a = jnp.sqrt(1.0 - u1)
    b = jnp.sqrt(u1)
    t2 = 2.0 * jnp.pi * u2
    t3 = 2.0 * jnp.pi * u3
    # [w, x, y, z]
    return jnp.stack(
        [a * jnp.sin(t2), a * jnp.cos(t2), b * jnp.sin(t3), b * jnp.cos(t3)],
        axis=-1,
    )


def random_rotation(key: jax.Array, shape=()) -> jax.Array:
    """Uniform random rotation matrices, shape (..., 3, 3)."""
    return quat_to_rotmat(random_quaternion(key, shape))


def transform_points(pts: jax.Array, rot: jax.Array) -> jax.Array:
    """Rotate points: (..., n, 3) by (..., 3, 3) -> (..., n, 3).

    Pinned to HIGHEST precision: the TPU bf16 matmul default would distort
    coordinates by ~0.4%, visibly breaking the patch-space normalization
    invariant (max norm == 1) and rotation orthogonality.
    """
    return jnp.einsum(
        "...ij,...nj->...ni", rot, pts, precision=jax.lax.Precision.HIGHEST
    )


def cartesian_dist(a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
    """Euclidean distance along `axis` (reference source/base/utils.py:8-10)."""
    return jnp.linalg.norm(a - b, axis=axis)


def patch_radii(pts_patch: jax.Array, query: jax.Array) -> jax.Array:
    """Adaptive patch radius = max distance from query to any patch point.

    Reference ``utils.get_patch_radii`` (source/base/utils.py:62-69), used in
    kNN mode where the patch radius is data-dependent
    (source/data_loader.py:346-347).

    Args:
      pts_patch: (..., n, 3) patch points (in model space).
      query: (..., 3) query point.

    Returns:
      (...,) radii.
    """
    d = jnp.linalg.norm(pts_patch - query[..., None, :], axis=-1)
    return jnp.max(d, axis=-1)


def model_space_to_patch_space(
    pts_ms: jax.Array, center_ms: jax.Array, radius_ms: jax.Array
) -> jax.Array:
    """(pts - center) / radius (reference source/base/utils.py:80-88).

    Args:
      pts_ms: (..., n, 3); center_ms: (..., 3); radius_ms: (...,).
    """
    return (pts_ms - center_ms[..., None, :]) / radius_ms[..., None, None]


def patch_space_to_model_space(
    pts_ps: jax.Array, center_ms: jax.Array, radius_ms: jax.Array
) -> jax.Array:
    """Inverse of :func:`model_space_to_patch_space`
    (reference source/base/utils.py:100-106)."""
    return pts_ps * radius_ms[..., None, None] + center_ms[..., None, :]
