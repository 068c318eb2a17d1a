"""Fused on-device patch extraction.

This is the TPU-native replacement for the reference's CPU hot loop —
``PointcloudPatchDataset.__getitem__`` (source/data_loader.py:322-421), which
runs a kd-tree query + numpy transforms per patch on DataLoader workers and
is the throughput ceiling of the original pipeline. Here the whole chain
(neighbor select -> pad-with-query -> adaptive radius -> patch-space
normalize -> global sub-sample -> rotation augmentation) is one jitted,
fixed-shape XLA program operating on a batch of queries against a
device-resident point cloud.

Performance design: the (B, N) squared-distance matrix is computed ONCE per
query chunk as an MXU matmul expansion, and every selection (kNN top-k,
random-in-ball subset, Gumbel-top-k sub-sampling) reads from it in the same
pass. Selection uses ``jax.lax.approx_max_k`` — the TPU-optimized partial
reduction (recall ~0.998 at our sizes, exact on CPU) — with an exact
``top_k`` fallback via ``PatchConfig.exact``. This replaced an earlier
streaming scan+merge design that was ~50x slower (sequential sorted merges).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from points2surf_tpu.ops import geometry
from points2surf_tpu.ops.knn import NEG_INF, _pairwise_sqdist


@dataclasses.dataclass(frozen=True)
class PatchConfig:
    """Static patch-extraction parameters (mirrors the reference CLI flags)."""

    points_per_patch: int = 300
    patch_radius: float = 0.0  # <= 0: kNN mode (data_loader.py:346-347)
    sub_sample_size: int = 1000
    uniform_subsample: bool = False
    fixed_subsample: bool = False
    query_chunk: int = 0  # queries per distance-matrix chunk; 0 = auto
    # (as many as fit the transient-memory budget — fewer, larger chunks
    # beat a serialized lax.map by >10x)
    exact: bool = False  # exact top_k instead of approx_max_k
    recall_target: float = 0.95  # approx_max_k recall (0.95 is ~17x faster
    # than 0.99 on v5e at our sizes; measured true recall ~0.99)
    chunk_budget_bytes: int = 4 << 30  # transient (qc, N) working-set cap
    subsample_candidates: int = 8  # Gumbel sub-sampling first uniformly
    # decimates the cloud to `subsample_candidates * sub_sample_size`
    # columns (min 8192) before the weighted draw — the weighted top-k over
    # the full cloud costs 7x more for a statistically equivalent sample
    # (the reference itself accepts with-replacement shortcuts for large
    # clouds, utils.py:214-216). 0 disables; `exact` also disables.
    overselect: int = 2  # kNN quality knob: approx-select overselect*k
    # candidates, then exact top-k among them. At 2 the measured patch
    # recall goes 0.956 -> 0.989 and mean radius error 2.3% -> 0.5% on
    # real scan clouds — a better quality/cost point than raising
    # recall_target. 1 disables (fastest), `exact` supersedes.

    @property
    def knn_mode(self) -> bool:
        return self.patch_radius <= 0.0


def _top_k(scores, k, exact, recall_target=0.95):
    if exact:
        return jax.lax.top_k(scores, k)
    return jax.lax.approx_max_k(scores, k, recall_target=recall_target)


@functools.partial(jax.jit, static_argnames=("cfg", "train", "small_cloud"))
def extract_patches(
    points: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    key: jax.Array,
    *,
    cfg: PatchConfig,
    train: bool,
    small_cloud: bool = False,
):
    """Extract network-ready patches for a batch of query points.

    Args:
      points: (N, 3) device-resident point cloud (model space), padded.
      queries: (B, 3) query points (model space); B must be a multiple of
        cfg.query_chunk or smaller than it.
      n_valid: scalar int32 valid-point count.
      key: PRNG key; consumed for ball-subset choice, sub-sampling, and
        train-time rotation augmentation.
      cfg: static :class:`PatchConfig`.
      train: static; enables the reference's random-rotation augmentation
        (data_loader.py:381-393).
      small_cloud: static; True when n_valid < sub_sample_size (switches
        sub-sampling to the shuffle+zero-pad path, utils.py:221-226).

    Returns:
      dict with the reference's batch keys (data_loader.py:395-404):
        patch_pts_ps (B,k,3), patch_radius_ms (B,), pts_sub_sample_ms (B,n,3),
        imp_surf_query_point_ms (B,3), imp_surf_query_point_ps (B,3),
        patch_pts_ids (B,k) int32 (debug plumbing, reference 'patch_pts_ids').
    """
    b = queries.shape[0]
    n = points.shape[0]
    k = cfg.points_per_patch
    sub_n = cfg.sub_sample_size
    if cfg.query_chunk > 0:
        qc = min(cfg.query_chunk, b)
    else:
        # auto: ~4 transient (qc, N) f32 arrays must fit the budget; 512
        # is the measured sweet spot for the top-k reductions (smaller
        # chunks keep the sort working set in VMEM, larger ones spill)
        qc = max(256, min(512, cfg.chunk_budget_bytes // (16 * n)))
        qc = min(qc, b)
    while b % qc != 0:  # shrink to a divisor of b
        qc -= 1
    k_sel, k_sub, k_aug = jax.random.split(key, 3)
    sub_key = jax.random.key(42) if cfg.fixed_subsample else k_sub
    # utils.py:210-211 pins the sub-sample RNG to seed 42 in fixed mode

    col_valid_row = (
        jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < n_valid
    )  # (1, N)

    want_gumbel_sub = sub_n > 0 and (not cfg.uniform_subsample or small_cloud)

    def process_chunk(ci_and_q):
        ci, q = ci_and_q  # q: (qc, 3)
        d2 = _pairwise_sqdist(q, points)  # (qc, N)
        invalid = ~col_valid_row

        # ---- patch selection ----
        if cfg.knn_mode:
            sel_scores = jnp.where(invalid, NEG_INF, -d2)
        else:
            u = jax.random.uniform(
                jax.random.fold_in(k_sel, ci), (qc, n)
            )
            in_ball = d2 <= cfg.patch_radius**2
            sel_scores = jnp.where(invalid | ~in_ball, NEG_INF, u)
        overselect = cfg.overselect if (cfg.knn_mode and not cfg.exact) else 1
        if overselect > 1 and overselect * k < n:
            cand_s, cand_i = _top_k(
                sel_scores, overselect * k, cfg.exact, cfg.recall_target
            )
            top_s, sub_idx = jax.lax.top_k(cand_s, k)
            top_i = jnp.take_along_axis(cand_i, sub_idx, axis=1)
        else:
            top_s, top_i = _top_k(sel_scores, k, cfg.exact, cfg.recall_target)
        pad = ~jnp.isfinite(top_s)

        # ---- sub-sample selection (reads the same d2) ----
        if want_gumbel_sub:
            # optional uniform decimation of the candidate columns: the
            # weighted draw over a dense uniform thinning is statistically
            # equivalent for n_cand >> sub_n and ~7x cheaper than the
            # full-cloud weighted top-k
            n_cand_target = max(8192, cfg.subsample_candidates * sub_n)
            decimate = (
                not cfg.exact
                and not small_cloud
                and cfg.subsample_candidates > 0
                and n > 2 * n_cand_target
            )
            if decimate:
                stride = n // n_cand_target
                n_cand = n // stride
                offset = jax.random.randint(
                    jax.random.fold_in(sub_key, 10_000 + ci), (), 0, stride
                )
                cols = offset + stride * jax.lax.broadcasted_iota(
                    jnp.int32, (n_cand,), 0
                )
                d2_sub = d2[:, cols]
                invalid_sub = (cols >= n_valid)[None, :]
            else:
                n_cand = n
                cols = None
                d2_sub = d2
                invalid_sub = invalid
            g = -jnp.log(
                -jnp.log(
                    jax.random.uniform(
                        jax.random.fold_in(sub_key, ci),
                        (qc, n_cand),
                        minval=jnp.finfo(jnp.float32).tiny,
                        maxval=1.0,
                    )
                )
            )
            if small_cloud or cfg.uniform_subsample:
                sub_scores = g  # plain shuffle (small-cloud path)
            else:
                d = jnp.sqrt(d2_sub)
                dmax = jnp.max(
                    jnp.where(invalid_sub, NEG_INF, d), axis=1, keepdims=True
                )
                w = jnp.clip(1.0 - 1.5 * d / dmax, 0.05, 1.0)
                sub_scores = jnp.log(w) + g
            sub_scores = jnp.where(invalid_sub, NEG_INF, sub_scores)
            sub_s, sub_i = _top_k(sub_scores, sub_n, cfg.exact, cfg.recall_target)
            if decimate:
                sub_i = cols[sub_i]  # map candidate column -> cloud index
            sub_pad = ~jnp.isfinite(sub_s)
        else:
            sub_i = jnp.zeros((qc, max(sub_n, 1)), jnp.int32)
            sub_pad = jnp.zeros((qc, max(sub_n, 1)), jnp.bool_)
        return top_i, pad, sub_i, sub_pad

    num_chunks = b // qc
    chunk_ids = jnp.arange(num_chunks)
    q_chunks = queries.reshape(num_chunks, qc, 3)
    top_i, pad, sub_i, sub_pad = jax.lax.map(
        process_chunk, (chunk_ids, q_chunks)
    )
    ids = top_i.reshape(b, k).astype(jnp.int32)
    pad = pad.reshape(b, k)
    sub_ids = sub_i.reshape(b, -1).astype(jnp.int32)
    sub_pad = sub_pad.reshape(b, -1)

    patch_pts_ms = points[ids]  # (B, k, 3)
    # padding points land on the query point -> patch origin after
    # normalization, near-inert under max-pool (data_loader.py:341-345)
    patch_pts_ms = jnp.where(pad[..., None], queries[:, None, :], patch_pts_ms)

    if cfg.knn_mode:
        # adaptive radius = max distance to a patch point (utils.py:62-69),
        # computed exactly from the gathered points (padding rows sit on the
        # query and cannot win the max).
        radius = geometry.patch_radii(patch_pts_ms, queries)
        radius = jnp.maximum(radius, 1e-12)
    else:
        radius = jnp.full((b,), cfg.patch_radius, jnp.float32)

    patch_pts_ps = geometry.model_space_to_patch_space(
        patch_pts_ms, queries, radius
    )

    if sub_n > 0:
        if cfg.uniform_subsample and not small_cloud:
            # randint WITH replacement (utils.py:213-216)
            uids = jax.random.randint(
                sub_key, (b, sub_n), 0, jnp.maximum(n_valid, 1)
            )
            sub = points[uids]
        else:
            sub = points[sub_ids]
            # zero-pad slots with no valid point (utils.py:221-226)
            sub = jnp.where(sub_pad[..., None], 0.0, sub)
    else:
        sub = jnp.zeros((b, 0, 3), jnp.float32)

    query_ms = queries
    # (q - q)/r == 0 identically (utils.py:72-77 applied to the query itself)
    query_ps = jnp.zeros_like(queries)

    if train:
        rot = geometry.random_rotation(k_aug, (b,))
        sub = geometry.transform_points(sub, rot)
        patch_pts_ps = geometry.transform_points(patch_pts_ps, rot)
        query_ms = jnp.einsum("bij,bj->bi", rot, query_ms)
        query_ps = jnp.einsum("bij,bj->bi", rot, query_ps)

    return {
        "patch_pts_ps": patch_pts_ps,
        "patch_radius_ms": radius,
        "pts_sub_sample_ms": sub,
        "imp_surf_query_point_ms": query_ms,
        "imp_surf_query_point_ps": query_ps,
        "patch_pts_ids": ids,
    }
