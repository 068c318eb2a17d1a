"""On-device brute-force neighbor search.

TPU-native replacement for the reference's per-shape scipy cKDTree queries
(source/base/point_cloud.py:170-194, source/data_loader.py:39-42). Instead of
a pointer-chasing tree (hostile to a dense-SIMD machine), we stream the point
cloud through VMEM in fixed-size chunks, compute squared distances with an
MXU-friendly ``|q|^2 - 2 q.p + |p|^2`` expansion, and maintain a running
top-k per query via merge (``lax.top_k``). Everything is fixed-shape and
jittable; invalid (padding) points are masked with -inf scores.

Two selection modes, mirroring the reference's patch queries:

* kNN (``patch_radius <= 0``): the k nearest points, sorted ascending by
  distance (reference kdtree.query, point_cloud.py:175).
* ball + random subset (``patch_radius > 0``): a uniformly random subset of
  at most k points within the radius — NOT the k nearest — matching the
  reference's ``rng.choice`` down-select of ball-query results
  (point_cloud.py:177-183). Implemented by ranking in-ball points by a
  uniform random priority (top-k of random keys == uniform subset without
  replacement).

Selected slots that have no valid point (cloud smaller than k, or fewer than
k points in the ball) are flagged in ``pad_mask``; callers replace them with
the query point, mirroring the reference's ``-1``-padding trick
(data_loader.py:341-345) that parks padding at the patch origin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


def _merge_topk(scores, ids, new_scores, new_ids, k):
    s = jnp.concatenate([scores, new_scores], axis=1)
    i = jnp.concatenate([ids, new_ids], axis=1)
    top_s, top_idx = jax.lax.top_k(s, k)
    return top_s, jnp.take_along_axis(i, top_idx, axis=1)


def _pairwise_sqdist(queries: jax.Array, pts: jax.Array) -> jax.Array:
    """(B,3) x (C,3) -> (B,C) squared distances via MXU-friendly expansion.

    The cross term is a matmul pinned to HIGHEST precision: the TPU default
    (bf16 passes) costs ~1e-2 absolute error on unit-scale clouds, enough to
    corrupt nearest-neighbor ordering and patch radii.
    """
    q2 = jnp.sum(queries * queries, axis=1, keepdims=True)  # (B,1)
    p2 = jnp.sum(pts * pts, axis=1)[None, :]  # (1,C)
    cross = jnp.dot(queries, pts.T, precision=jax.lax.Precision.HIGHEST)
    d2 = q2 - 2.0 * cross + p2
    return jnp.maximum(d2, 0.0)


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "use_ball", "radius_is_static")
)
def patch_select(
    points: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    *,
    radius: float | jax.Array = 0.0,
    key: jax.Array | None = None,
    chunk: int = 8192,
    use_ball: bool = False,
    radius_is_static: bool = True,
):
    """Select up to ``k`` patch point indices for each query.

    Args:
      points: (N, 3) point cloud; rows >= n_valid are padding.
      queries: (B, 3) query points.
      n_valid: scalar int, number of valid rows in ``points``.
      k: points per patch (static).
      radius: ball radius; only used when ``use_ball``.
      key: PRNG key for the random in-ball subset (required when use_ball).
      chunk: streaming chunk size over N (static).
      use_ball: static flag selecting ball mode vs kNN mode.

    Returns:
      ids: (B, k) int32 indices into ``points`` (arbitrary for padded slots).
      sqdists: (B, k) squared distances query->point (kNN mode: ascending;
        ball mode: distances of the selected random subset, unordered).
      pad_mask: (B, k) bool, True where the slot has no valid point.
    """
    n = points.shape[0]
    b = queries.shape[0]
    num_chunks = -(-n // chunk)
    n_pad = num_chunks * chunk
    pts = jnp.pad(points, ((0, n_pad - n), (0, 0)))
    if use_ball and key is None:
        raise ValueError("ball mode requires a PRNG key")
    r2 = None
    if use_ball:
        r2 = jnp.asarray(radius, jnp.float32) ** 2

    # carry: (scores, ids[, d2s])
    init_scores = jnp.full((b, k), NEG_INF, jnp.float32)
    init_ids = jnp.zeros((b, k), jnp.int32)
    if use_ball:
        init = (init_scores, init_ids, jnp.zeros((b, k), jnp.float32))
    else:
        init = (init_scores, init_ids)

    def scan_body(carry, ci):
        if use_ball:
            scores, ids, d2s = carry
        else:
            scores, ids = carry
        start = ci * chunk
        p = jax.lax.dynamic_slice(pts, (start, 0), (chunk, 3))
        d2 = _pairwise_sqdist(queries, p)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        invalid = col >= n_valid
        if use_ball:
            u = jax.random.uniform(jax.random.fold_in(key, ci), (b, chunk))
            new_scores = jnp.where(invalid | (d2 > r2), NEG_INF, u)
            s = jnp.concatenate([scores, new_scores], axis=1)
            i = jnp.concatenate([ids, col], axis=1)
            ds = jnp.concatenate([d2s, d2], axis=1)
            top_s, top_idx = jax.lax.top_k(s, k)
            carry = (
                top_s,
                jnp.take_along_axis(i, top_idx, axis=1),
                jnp.take_along_axis(ds, top_idx, axis=1),
            )
        else:
            new_scores = jnp.where(invalid, NEG_INF, -d2)
            scores, ids = _merge_topk(scores, ids, new_scores, col, k)
            carry = (scores, ids)
        return carry, None

    carry, _ = jax.lax.scan(scan_body, init, jnp.arange(num_chunks))
    if use_ball:
        scores, ids, d2s = carry
        pad_mask = ~jnp.isfinite(scores)
        sqd = jnp.where(pad_mask, 0.0, d2s)
    else:
        scores, ids = carry
        pad_mask = ~jnp.isfinite(scores)
        sqd = jnp.where(pad_mask, 0.0, -scores)
    return ids, sqd, pad_mask


def knn(points, queries, n_valid, k, chunk: int = 8192):
    """k nearest neighbors: ids (B,k) ascending by distance, dists (B,k)."""
    ids, sqd, pad = patch_select(
        points, queries, n_valid, k, chunk=chunk, use_ball=False
    )
    return ids, jnp.sqrt(sqd), pad
