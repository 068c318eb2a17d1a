"""On-device global point-cloud sub-sampling (standalone API).

TPU-native replacement for the reference's per-patch numpy sub-sampling
(``get_point_cloud_sub_sample``, source/base/utils.py:196-227). The fused
production pipeline uses the decimated variant inlined in
``ops/patches._gumbel_subsample`` (same distribution, one fewer pass);
this module is the exact streamed form — kept as the oracle-tested
standalone op for external callers and as the reference implementation
the decimated variant is validated against. Three modes:

* ``dist_weighted`` (reference default): sample ``n`` points WITHOUT
  replacement with probability linearly decreasing with distance to the
  query point: ``p = clip(1 - 1.5 * d / d_max, 0.05, 1)`` (utils.py:200-208).
  ``numpy.random.choice(replace=False, p=...)`` is awkward on an accelerator;
  we use the Gumbel-top-k trick, which draws exactly the same distribution:
  ``top_n(log w_i + Gumbel_i)`` is a without-replacement sample ∝ w_i.
  Distances are streamed over fixed chunks (two passes: max-distance, then
  Gumbel top-k merge), so the (B, N) weight matrix is never materialized.
* ``uniform``: randint WITH replacement (utils.py:213-216).
* small clouds (``n_valid < n``): every valid point once (shuffled), then
  zero padding (utils.py:221-226) — the Gumbel path with unit weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from points2surf_tpu.ops.knn import NEG_INF, _pairwise_sqdist


@functools.partial(jax.jit, static_argnames=("n", "chunk", "mode", "small_cloud"))
def subsample_batch(
    points: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    n: int,
    key: jax.Array,
    *,
    mode: str = "dist_weighted",
    small_cloud: bool = False,
    chunk: int = 8192,
):
    """Sub-sample ``n`` global points per query.

    Args:
      points: (N, 3) padded point cloud (model space).
      queries: (B, 3) query points.
      n_valid: scalar int32 count of valid rows in ``points``.
      n: sub-sample size (static).
      key: PRNG key. Pass a constant key for the reference's
        ``--fixed_subsample`` debugging semantics (utils.py:210-211).
      mode: 'dist_weighted' or 'uniform' (static).
      small_cloud: static flag; True when the host knows n_valid < n, which
        switches to the shuffle+zero-pad path of the reference.
      chunk: streaming chunk size (static).

    Returns:
      (B, n, 3) sub-sampled points (zero rows for padding on small clouds).
    """
    if mode not in ("dist_weighted", "uniform"):
        raise ValueError(f"unknown subsample mode: {mode}")
    b = queries.shape[0]
    npts = points.shape[0]
    num_chunks = -(-npts // chunk)
    n_pad = num_chunks * chunk
    pts = jnp.pad(points, ((0, n_pad - npts), (0, 0)))

    if mode == "uniform" and not small_cloud:
        ids = jax.random.randint(key, (b, n), 0, jnp.maximum(n_valid, 1))
        return pts[ids]

    use_dist = mode == "dist_weighted" and not small_cloud

    if use_dist:
        # pass 1: per-query max squared distance over valid points
        def max_body(dmax2, ci):
            start = ci * chunk
            p = jax.lax.dynamic_slice(pts, (start, 0), (chunk, 3))
            d2 = _pairwise_sqdist(queries, p)
            col = start + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
            d2 = jnp.where(col >= n_valid, NEG_INF, d2)
            return jnp.maximum(dmax2, jnp.max(d2, axis=1)), None

        dmax2, _ = jax.lax.scan(
            max_body, jnp.full((b,), NEG_INF, jnp.float32), jnp.arange(num_chunks)
        )
        dmax = jnp.sqrt(jnp.maximum(dmax2, 1e-30))

    # pass 2: streaming Gumbel top-n
    def gumbel_body(carry, ci):
        scores, ids = carry
        start = ci * chunk
        p = jax.lax.dynamic_slice(pts, (start, 0), (chunk, 3))
        col = start + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        invalid = col >= n_valid
        g = -jnp.log(
            -jnp.log(
                jax.random.uniform(
                    jax.random.fold_in(key, ci),
                    (b, chunk),
                    minval=jnp.finfo(jnp.float32).tiny,
                    maxval=1.0,
                )
            )
        )
        if use_dist:
            d = jnp.sqrt(_pairwise_sqdist(queries, p))
            w = jnp.clip(1.0 - 1.5 * d / dmax[:, None], 0.05, 1.0)
            score = jnp.log(w) + g
        else:
            score = g
        score = jnp.where(invalid, NEG_INF, score)
        s = jnp.concatenate([scores, score], axis=1)
        i = jnp.concatenate([ids, col], axis=1)
        top_s, top_idx = jax.lax.top_k(s, n)
        return (top_s, jnp.take_along_axis(i, top_idx, axis=1)), None

    init = (
        jnp.full((b, n), NEG_INF, jnp.float32),
        jnp.zeros((b, n), jnp.int32),
    )
    (scores, ids), _ = jax.lax.scan(gumbel_body, init, jnp.arange(num_chunks))
    out = pts[ids]
    # zero-pad slots with no valid point (small clouds), utils.py:221-226
    return jnp.where(jnp.isfinite(scores)[..., None], out, 0.0)
