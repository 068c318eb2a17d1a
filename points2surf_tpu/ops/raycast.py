"""On-device ray-mesh intersection (Möller–Trumbore, brute force).

Powers the TPU-native virtual scanner (datagen/scanner.py) that replaces the
reference's external BlenSor/Blender dependency (make_dataset.py:242-380)
for dataset generation: one scan = a grid of rays against all triangles,
streamed over triangle chunks, nearest hit wins. 25k rays x 50k triangles is
~40 GFLOP — milliseconds on the MXU-free VPU path, seconds at worst.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("tri_chunk",))
def raycast_padded(
    origins: jax.Array,
    dirs: jax.Array,
    tri_a: jax.Array,
    tri_b: jax.Array,
    tri_c: jax.Array,
    n_tris: jax.Array,
    tri_chunk: int = 2048,
):
    """Nearest-hit raycast against a padded triangle soup.

    Args:
      origins: (R, 3) ray origins.
      dirs: (R, 3) ray directions (need not be normalized; t is in units
        of |dir|).
      tri_a/b/c: (Fp, 3) triangle vertices, padding rows degenerate.
      n_tris: scalar valid triangle count.

    Returns:
      t: (R,) hit parameter (inf where no hit).
      tri_id: (R,) int32 index of the hit triangle (-1 where no hit).
    """
    fp = tri_a.shape[0]
    num_chunks = -(-fp // tri_chunk)
    eps = 1e-9

    def body(carry, ci):
        best_t, best_id = carry
        s0 = ci * tri_chunk
        a = jax.lax.dynamic_slice(tri_a, (s0, 0), (tri_chunk, 3))
        b = jax.lax.dynamic_slice(tri_b, (s0, 0), (tri_chunk, 3))
        c = jax.lax.dynamic_slice(tri_c, (s0, 0), (tri_chunk, 3))
        col = s0 + jax.lax.broadcasted_iota(jnp.int32, (1, tri_chunk), 1)
        valid = col < n_tris

        e1 = (b - a)[None]  # (1, C, 3)
        e2 = (c - a)[None]
        d = dirs[:, None, :]  # (R, 1, 3)
        o = origins[:, None, :]
        h = jnp.cross(d, e2)
        det = jnp.sum(e1 * h, -1)  # (R, C)
        inv_det = jnp.where(jnp.abs(det) < eps, 0.0, 1.0 / det)
        s = o - a[None]
        u = jnp.sum(s * h, -1) * inv_det
        q = jnp.cross(s, e1)
        v = jnp.sum(d * q, -1) * inv_det
        t = jnp.sum(e2 * q, -1) * inv_det
        hit = (
            (jnp.abs(det) >= eps)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > 1e-6)
            & valid
        )
        t = jnp.where(hit, t, jnp.inf)
        tmin = jnp.min(t, axis=1)
        amin = jnp.argmin(t, axis=1).astype(jnp.int32) + s0
        better = tmin < best_t
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better, amin, best_id),
        ), None

    r = origins.shape[0]
    init = (
        jnp.full((r,), jnp.inf, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
    )
    (best_t, best_id), _ = jax.lax.scan(body, init, jnp.arange(num_chunks))
    best_id = jnp.where(jnp.isfinite(best_t), best_id, -1)
    return best_t, best_id


def pad_triangles(vertices: np.ndarray, faces: np.ndarray,
                  tri_chunk: int = 2048):
    """Host helper: mesh -> padded (a, b, c) device arrays + count."""
    f = np.asarray(faces, np.int64)
    v = np.asarray(vertices, np.float32)
    n_tris = len(f)
    fp = max(tri_chunk, -(-n_tris // tri_chunk) * tri_chunk)
    tri = np.zeros((3, fp, 3), np.float32)
    if n_tris:
        tri[:, :n_tris] = v[f.T]
    return (
        jnp.asarray(tri[0]),
        jnp.asarray(tri[1]),
        jnp.asarray(tri[2]),
        n_tris,
    )
