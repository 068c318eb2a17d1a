"""On-device signed distance to a triangle mesh.

Replaces ``trimesh.proximity.signed_distance`` in the reference's dataset
generation (source/sdf.py:318-348) — which needs ~8 GB RAM for 3k queries
(reference comment sdf.py:323-325) — with a brute-force TPU program:
point-to-triangle distances (Ericson's region-based closest-point algorithm)
and the generalized winding number (van Oosterom–Strackee solid angles) for
the inside/outside sign, both streamed over triangle chunks. Exact for
watertight meshes; the winding number degrades gracefully on near-manifold
input.

Sign convention: positive INSIDE, matching trimesh and the reference's GT
distances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _point_triangle_closest(p, a, b, c):
    """Closest point on triangles + squared distance, fully broadcast.

    Ericson, "Real-Time Collision Detection", closest-point-on-triangle,
    expressed as a flat where-chain (vectorizes on the VPU).
    p: (..., 3); a, b, c: (..., 3) — broadcast together.
    Returns (sqdist (...,), closest (..., 3)).
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    eps = 1e-20
    # interior (barycentric) projection
    denom = jnp.maximum(va + vb + vc, eps)
    v_in = vb / denom
    w_in = vc / denom
    q_interior = a + v_in[..., None] * ab + w_in[..., None] * ac

    t_ab = d1 / jnp.where(d1 - d3 == 0, eps, d1 - d3)
    q_ab = a + jnp.clip(t_ab, 0.0, 1.0)[..., None] * ab
    t_ac = d2 / jnp.where(d2 - d6 == 0, eps, d2 - d6)
    q_ac = a + jnp.clip(t_ac, 0.0, 1.0)[..., None] * ac
    t_bc = (d4 - d3) / jnp.where(
        (d4 - d3) + (d5 - d6) == 0, eps, (d4 - d3) + (d5 - d6)
    )
    q_bc = b + jnp.clip(t_bc, 0.0, 1.0)[..., None] * (c - b)

    q = q_interior
    q = jnp.where((va <= 0)[..., None]
                  & ((d4 - d3) >= 0)[..., None]
                  & ((d5 - d6) >= 0)[..., None], q_bc, q)
    q = jnp.where((vb <= 0)[..., None] & (d2 >= 0)[..., None]
                  & (d6 <= 0)[..., None], q_ac, q)
    q = jnp.where((vc <= 0)[..., None] & (d1 >= 0)[..., None]
                  & (d3 <= 0)[..., None], q_ab, q)
    q = jnp.where((d6 >= 0)[..., None] & (d5 <= d6)[..., None], c, q)
    q = jnp.where((d3 >= 0)[..., None] & (d4 <= d3)[..., None], b, q)
    q = jnp.where((d1 <= 0)[..., None] & (d2 <= 0)[..., None], a, q)

    diff = p - q
    return jnp.sum(diff * diff, -1), q


def _point_triangle_sqdist(p, a, b, c):
    return _point_triangle_closest(p, a, b, c)[0]


def _solid_angle(p, a, b, c):
    """Signed solid angle of triangle (a,b,c) from viewpoint p
    (van Oosterom & Strackee 1983). Shapes broadcast like above."""
    ra = a - p
    rb = b - p
    rc = c - p
    la = jnp.linalg.norm(ra, axis=-1)
    lb = jnp.linalg.norm(rb, axis=-1)
    lc = jnp.linalg.norm(rc, axis=-1)
    num = jnp.sum(ra * jnp.cross(rb, rc), -1)
    den = (
        la * lb * lc
        + jnp.sum(ra * rb, -1) * lc
        + jnp.sum(rb * rc, -1) * la
        + jnp.sum(rc * ra, -1) * lb
    )
    return 2.0 * jnp.arctan2(num, den)


@functools.partial(jax.jit, static_argnames=("tri_chunk",))
def signed_distance_padded(
    queries: jax.Array,
    tri_a: jax.Array,
    tri_b: jax.Array,
    tri_c: jax.Array,
    n_tris: jax.Array,
    tri_chunk: int = 2048,
):
    """Signed distances of queries to a (padded) triangle soup.

    Args:
      queries: (Q, 3).
      tri_a/b/c: (Fp, 3) triangle vertices, rows >= n_tris are padding
        (must be degenerate zero triangles).
      n_tris: scalar valid triangle count.

    Returns:
      (Q,) signed distances (positive inside) and (Q,) winding numbers.
    """
    fp = tri_a.shape[0]
    num_chunks = -(-fp // tri_chunk)

    def body(carry, ci):
        best_sq, wind = carry
        s = ci * tri_chunk
        a = jax.lax.dynamic_slice(tri_a, (s, 0), (tri_chunk, 3))
        b = jax.lax.dynamic_slice(tri_b, (s, 0), (tri_chunk, 3))
        c = jax.lax.dynamic_slice(tri_c, (s, 0), (tri_chunk, 3))
        col = s + jax.lax.broadcasted_iota(jnp.int32, (1, tri_chunk), 1)
        valid = col < n_tris  # (1, chunk)
        p = queries[:, None, :]  # (Q, 1, 3)
        sq = _point_triangle_sqdist(p, a[None], b[None], c[None])
        sq = jnp.where(valid, sq, jnp.inf)
        best_sq = jnp.minimum(best_sq, jnp.min(sq, axis=1))
        omega = _solid_angle(p, a[None], b[None], c[None])
        omega = jnp.where(valid, omega, 0.0)
        wind = wind + jnp.sum(omega, axis=1)
        return (best_sq, wind), None

    q = queries.shape[0]
    init = (jnp.full((q,), jnp.inf, jnp.float32), jnp.zeros((q,), jnp.float32))
    (best_sq, wind), _ = jax.lax.scan(body, init, jnp.arange(num_chunks))
    winding = wind / (4.0 * jnp.pi)
    # |w| makes the inside test robust to globally inverted face
    # orientation (winding is ±1 inside, ~0 outside)
    sign = jnp.where(jnp.abs(winding) > 0.5, 1.0, -1.0)
    return sign * jnp.sqrt(best_sq), winding


@functools.partial(jax.jit, static_argnames=("tri_chunk",))
def closest_point_padded(
    queries: jax.Array,
    tri_a: jax.Array,
    tri_b: jax.Array,
    tri_c: jax.Array,
    n_tris: jax.Array,
    tri_chunk: int = 2048,
):
    """Exact closest point on a (padded) triangle soup.

    Returns (closest (Q, 3), sqdist (Q,), face_id (Q,) int32) — the on-device
    equivalent of the reference's batched trimesh closest_point pool
    (source/base/point_cloud.py:197-220).
    """
    fp = tri_a.shape[0]
    num_chunks = -(-fp // tri_chunk)
    q_n = queries.shape[0]

    def body(carry, ci):
        best_sq, best_q, best_id = carry
        s = ci * tri_chunk
        a = jax.lax.dynamic_slice(tri_a, (s, 0), (tri_chunk, 3))
        b = jax.lax.dynamic_slice(tri_b, (s, 0), (tri_chunk, 3))
        c = jax.lax.dynamic_slice(tri_c, (s, 0), (tri_chunk, 3))
        col = s + jax.lax.broadcasted_iota(jnp.int32, (1, tri_chunk), 1)
        valid = col < n_tris  # (1, chunk)
        p = queries[:, None, :]  # (Q, 1, 3)
        sq, cp = _point_triangle_closest(p, a[None], b[None], c[None])
        sq = jnp.where(valid, sq, jnp.inf)
        arg = jnp.argmin(sq, axis=1)  # (Q,)
        rows = jnp.arange(q_n)
        sq_c = sq[rows, arg]
        better = sq_c < best_sq
        best_q = jnp.where(better[:, None], cp[rows, arg], best_q)
        best_id = jnp.where(better, (s + arg).astype(jnp.int32), best_id)
        best_sq = jnp.minimum(best_sq, sq_c)
        return (best_sq, best_q, best_id), None

    init = (
        jnp.full((q_n,), jnp.inf, jnp.float32),
        jnp.zeros((q_n, 3), jnp.float32),
        jnp.zeros((q_n,), jnp.int32),
    )
    (best_sq, best_q, best_id), _ = jax.lax.scan(
        body, init, jnp.arange(num_chunks)
    )
    return best_q, best_sq, best_id


def closest_point_on_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    queries: np.ndarray,
    query_batch: int = 8192,
    tri_chunk: int = 2048,
):
    """Host wrapper: exact closest point / distance / face id per query
    (reference get_closest_distance_batched, point_cloud.py:197-220)."""
    f = np.asarray(faces, np.int64)
    v = np.asarray(vertices, np.float32)
    n_tris = len(f)
    fp = max(tri_chunk, -(-n_tris // tri_chunk) * tri_chunk)
    tri = np.zeros((3, fp, 3), np.float32)
    tri[:, :n_tris] = v[f.T]
    ta, tb, tc = (jnp.asarray(t) for t in tri)

    n_q = len(queries)
    closest = np.empty((n_q, 3), np.float32)
    dist = np.empty(n_q, np.float32)
    face_ids = np.empty(n_q, np.int64)
    for s in range(0, n_q, query_batch):
        q = np.asarray(queries[s : s + query_batch], np.float32)
        nb = len(q)
        if nb < query_batch:
            q = np.concatenate(
                [q, np.zeros((query_batch - nb, 3), np.float32)]
            )
        cq, sq, fid = closest_point_padded(
            jnp.asarray(q), ta, tb, tc, n_tris, tri_chunk=tri_chunk
        )
        closest[s : s + nb] = np.asarray(cq)[:nb]
        dist[s : s + nb] = np.sqrt(np.asarray(sq)[:nb])
        face_ids[s : s + nb] = np.asarray(fid)[:nb]
    return closest, dist, face_ids


def signed_distance(
    vertices: np.ndarray,
    faces: np.ndarray,
    queries: np.ndarray,
    query_batch: int = 8192,
    tri_chunk: int = 2048,
) -> np.ndarray:
    """Host wrapper: pads the mesh, streams query batches through the device.

    Equivalent role to reference ``get_signed_distance`` (sdf.py:318-348),
    including its batching-over-queries structure.
    """
    f = np.asarray(faces, np.int64)
    v = np.asarray(vertices, np.float32)
    n_tris = len(f)
    fp = max(tri_chunk, -(-n_tris // tri_chunk) * tri_chunk)
    tri = np.zeros((3, fp, 3), np.float32)
    tri[:, :n_tris] = v[f.T]  # (3, F, 3)
    ta, tb, tc = (jnp.asarray(t) for t in tri)

    out = np.empty(len(queries), np.float32)
    for s in range(0, len(queries), query_batch):
        q = np.asarray(queries[s : s + query_batch], np.float32)
        pad = query_batch - len(q)
        if pad > 0:
            q = np.concatenate([q, np.zeros((pad, 3), np.float32)])
        d, _ = signed_distance_padded(
            jnp.asarray(q), ta, tb, tc, n_tris, tri_chunk=tri_chunk
        )
        out[s : s + query_batch] = np.asarray(d)[: query_batch - max(pad, 0)]
    return out
