"""Fused on-device patch extraction.

This is the TPU-native replacement for the reference's CPU hot loop —
``PointcloudPatchDataset.__getitem__`` (source/data_loader.py:322-421), which
runs a kd-tree query + numpy transforms per patch on DataLoader workers and
is the throughput ceiling of the original pipeline. Here the whole chain
(neighbor select -> pad-with-query -> adaptive radius -> patch-space
normalize -> global sub-sample -> rotation augmentation) is one jitted,
fixed-shape XLA program operating on a batch of queries against a
device-resident point cloud.

kNN strategy (the TPU answer to a kd-tree): eval/reconstruction queries
are Morton-sorted on device and grouped into spatial tiles; each tile
selects one shared candidate set — the M points nearest the tile centroid
(a single top-M row per tile) — then every query runs an EXACT top-k over
those candidates, with a per-tile soundness certificate
(``d_k(q) + |q - centroid| <= R_M``; ball mode certifies candidate-set
completeness via ``max|q - centroid| + r <= R_M``). If any tile fails,
ONE whole-batch cond falls back to high-recall dense selection
(quality-neutral on reconstructions, docs/VALIDATION.md). Reconstruction
query lists are Morton-ordered on the host (ops/voxel.grid_query_points)
so batches are tight blocks and certify most of the time. Training
batches (spread random patches, where selection noise is just
augmentation) use the cheap dense-approx path directly; ``exact`` uses
dense passes.

Sub-sampling (distance-weighted, without replacement) runs as Gumbel-top-k
over a uniform decimation of the cloud (statistically equivalent for dense
clouds, reference itself accepts with-replacement shortcuts for large
clouds, utils.py:214-216).
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
    exact: bool = False  # dense exact top_k everywhere (parity/testing)
    recall_target: float = 0.95  # approx_max_k recall for dense fallbacks
    tile_queries: int = 128  # queries per spatial tile (kNN fast path)
    tile_candidates: int = 8192  # shared candidates per tile; smaller
    # tiles + more candidates maximize the tile-certification rate (any
    # uncertified tile sends the whole batch down the dense-exact path)
    subsample_candidates: int = 8  # decimation factor for the Gumbel draw:
    # candidates = max(8192, this * sub_sample_size) uniformly-strided
    # columns. 0 disables decimation.
    query_chunk: int = 512  # query rows per dense-pass chunk (ball mode /
    # exact fallback); measured sweet spot for full-width top-k reductions

    @property
    def knn_mode(self) -> bool:
        return self.patch_radius <= 0.0


def _top_k(scores, k, exact, recall_target=0.95):
    if exact:
        return jax.lax.top_k(scores, k)
    return jax.lax.approx_max_k(scores, k, recall_target=recall_target)


def _morton_codes(q: jax.Array) -> jax.Array:
    """30-bit Morton codes of points in (-1, 1)^3 (10 bits/axis)."""
    g = jnp.clip(((q + 1.0) * 0.5 * 1024.0).astype(jnp.int32), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return spread(g[:, 0]) | (spread(g[:, 1]) << 1) | (spread(g[:, 2]) << 2)


def _ball_tile_candidates(cfg, n):
    """Candidate-set size for ball-mode tiles, derived from expected
    in-ball density: the certificate needs the candidates to cover every
    point within ``max|q - c| + r`` of the tile centroid, and for
    surface-sampled clouds that count grows ~ n * r^2 (a 2-manifold in a
    ~unit-extent volume) until the ball covers a large fraction of the
    object, where it saturates.

    Model: depth = n * min(cap, factor * r^2), floored at
    ``cfg.tile_candidates`` and rounded up to 1024. The constants are
    calibrated on the round-2 measurements for a 60k cloud
    (docs/PERFORMANCE.md): r=0.05 -> 8192 certified at 32k q/s;
    r=0.1/0.2 -> 16384 certified at ~29k q/s (8192 left most tiles
    uncertified there). Unlike the previous hard-coded r>=0.08 step,
    this scales with cloud size, so much denser clouds (150k+) keep
    certifying instead of silently dropping to the whole-batch exact
    fallback (a perf cliff, not a correctness issue)."""
    factor = 27.3  # 16384/60000 needed at r=0.1 -> 0.273 = factor * 0.1^2
    cap = 0.28  # saturation: ~17k/60k sufficed at r=0.2
    frac = min(cap, factor * cfg.patch_radius**2)
    m = max(cfg.tile_candidates, int(-(-(n * frac) // 1024)) * 1024)
    return min(m, n)


def _tile_select(points, queries, n_valid, k, cfg, tile, key, m=None,
                 approx_eval=False):
    """Morton-tiled neighbor selection with per-tile exactness certificate.

    Each tile selects the M points nearest its centroid as a shared
    candidate set, then per-query selection runs over those candidates:

    * kNN mode: exact top-k by distance; exact for a query when
      ``d_k(q) + |q - c| <= R_M`` (the M-th candidate's centroid
      distance) — using the candidate-estimated d_k, which over-estimates
      the true one, so a passing check is sound.
    * ball mode (reference semantics: a uniformly random subset of the
      in-radius points, point_cloud.py:177-183): random scores over the
      in-ball candidates; the draw matches the full-cloud draw in
      distribution whenever the candidate set contains EVERY in-ball
      point, which ``max_q |q - c| + r <= R_M`` guarantees (any p with
      |p-q| <= r has |p-c| <= |q-c| + r).

    When n_valid <= M the candidate set is exhaustive and the
    trivially-passing certificate (R_M = inf via masked padding) is also
    correct.

    Returns ids (B,k) int32, values (B,k) = -sqdist or NEG_INF, pad mask
    (B,k), and a scalar bool: True iff EVERY tile certified (the caller
    falls back for the whole batch otherwise).
    """
    b = queries.shape[0]
    n = points.shape[0]
    if m is None:
        m = min(cfg.tile_candidates, n)

    order = jnp.argsort(_morton_codes(queries))
    qs = queries[order]

    col_invalid = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) >= n_valid

    def per_tile(args):
        ti, qt = args  # scalar tile index, (tile, 3)
        c = jnp.mean(qt, axis=0, keepdims=True)
        dc = _pairwise_sqdist(c, points)[0]  # (N,)
        dc_masked = jnp.where(col_invalid, NEG_INF, -dc)
        # exact candidate selection: soundness of the certificate needs
        # the candidate set to contain EVERY point within R_M of the
        # centroid (approx selection could silently miss one)
        neg_dc_cand, cand = jax.lax.top_k(dc_masked, m)
        cp = points[cand]  # (M, 3)
        d2 = _pairwise_sqdist(qt, cp)  # (tile, M)
        cand_invalid = (cand >= n_valid)[None, :]
        r_m = jnp.sqrt(jnp.maximum(-neg_dc_cand[-1], 0.0))
        q_c = jnp.linalg.norm(qt - c, axis=1)

        if cfg.knn_mode:
            scores = jnp.where(cand_invalid, NEG_INF, -d2)
            if approx_eval:
                # P2S_EVAL_APPROX_SELECT: the exact per-query top-k lowers
                # to full bitonic sorts and is the single largest
                # extraction stage (23.6 ms/batch at production shapes,
                # docs/PERFORMANCE.md round 4); approx_max_k at
                # recall 0.999 costs 19.9 ms — same as at 0.95, so take
                # the highest recall. The certificate below stays sound
                # (the approx d_k over-estimates the true one), but a
                # certified tile is then recall-0.999 rather than exact.
                v, i = jax.lax.approx_max_k(scores, k, recall_target=0.999)
            else:
                v, i = jax.lax.top_k(scores, k)
            ids = cand[i]
            # certificate (sound: candidate d_k >= true d_k)
            d_k = jnp.sqrt(jnp.maximum(-v[:, -1], 0.0))
            certified = jnp.all(
                jnp.where(jnp.isfinite(v[:, -1]), d_k + q_c <= r_m, True)
            )
        else:
            u = jax.random.uniform(jax.random.fold_in(key, ti), (tile, m))
            in_ball = d2 <= cfg.patch_radius**2
            scores = jnp.where(cand_invalid | ~in_ball, NEG_INF, u)
            uv, i = jax.lax.top_k(scores, k)
            ids = cand[i]
            d2_sel = jnp.take_along_axis(d2, i, axis=1)
            v = jnp.where(jnp.isfinite(uv), -d2_sel, NEG_INF)
            certified = jnp.max(q_c) + cfg.patch_radius <= r_m
        return v, ids, certified

    n_tiles = qs.shape[0] // tile
    v_t, ids_t, cert_t = jax.lax.map(
        per_tile, (jnp.arange(n_tiles), qs.reshape(n_tiles, tile, 3))
    )
    ids_sorted = ids_t.reshape(b, k).astype(jnp.int32)
    v_sorted = v_t.reshape(b, k)

    inv = jnp.argsort(order)
    ids = ids_sorted[inv]
    v = v_sorted[inv]
    pad = ~jnp.isfinite(v)
    return ids, jnp.where(pad, 0.0, -v), pad, jnp.all(cert_t)


def _dense_select(points, queries, n_valid, k, cfg, key, approx_ok=False):
    """Dense full-cloud selection: kNN (exact, or approx for callers that
    tolerate ~0.95 recall, i.e. training batches), or random-in-ball subset
    (reference ball mode picks a uniformly random subset of in-radius
    points, point_cloud.py:177-183)."""
    b = queries.shape[0]
    n = points.shape[0]
    qc = min(cfg.query_chunk, b)
    while b % qc != 0:
        qc -= 1
    exact = cfg.exact or not approx_ok

    def chunk(args):
        ci, q = args
        d2 = _pairwise_sqdist(q, points)
        invalid = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) >= n_valid
        if cfg.knn_mode:
            scores = jnp.where(invalid, NEG_INF, -d2)
            v, i = _top_k(scores, k, exact, cfg.recall_target)
            if not exact:
                d2_sel = jnp.take_along_axis(d2, i, axis=1)
                v = jnp.where(jnp.isfinite(v), -d2_sel, NEG_INF)
            return i, v
        u = jax.random.uniform(jax.random.fold_in(key, ci), (qc, n))
        in_ball = d2 <= cfg.patch_radius**2
        scores = jnp.where(invalid | ~in_ball, NEG_INF, u)
        # eval callers (approx_ok=False) need the exact uniform-subset
        # semantics: approx_max_k over the random priorities can MISS
        # in-ball points of under-full balls (recall < 1), producing
        # incomplete patches. Training tolerates that as selection noise.
        v, i = _top_k(scores, k, exact, cfg.recall_target)
        d2_sel = jnp.take_along_axis(d2, i, axis=1)
        return i, jnp.where(jnp.isfinite(v), -d2_sel, NEG_INF)

    num_chunks = b // qc
    ids, v = jax.lax.map(
        chunk, (jnp.arange(num_chunks), queries.reshape(num_chunks, qc, 3))
    )
    ids = ids.reshape(b, k).astype(jnp.int32)
    v = v.reshape(b, k)
    pad = ~jnp.isfinite(v)
    return ids, jnp.where(pad, 0.0, -v), pad


def _gumbel_subsample(points, queries, n_valid, sub_n, key, cfg,
                      small_cloud, uniform_shuffle):
    """Distance-weighted (or plain-shuffle) sampling without replacement
    via Gumbel-top-k over a uniformly decimated candidate set."""
    b = queries.shape[0]
    n = points.shape[0]
    # floor of 2x oversampling keeps weighted selection meaningful for
    # small sub_n; the default factor 8 with sub_n=1000 targets ~8k
    # candidates (the depth validated quality-neutral in round 1)
    n_cand_target = max(2 * sub_n, cfg.subsample_candidates * sub_n)
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
            jax.random.fold_in(key, 10_000), (), 0, stride
        )
        cols = offset + stride * jax.lax.broadcasted_iota(
            jnp.int32, (n_cand,), 0
        )
        cand_pts = points[cols]
    else:
        n_cand = n
        cols = None
        cand_pts = points

    invalid = (
        (cols if cols is not None
         else jax.lax.broadcasted_iota(jnp.int32, (n_cand,), 0))
        >= n_valid
    )[None, :]

    qc = min(cfg.query_chunk * 4, b)  # candidate width is small; big chunks
    while b % qc != 0:
        qc -= 1

    def chunk(args):
        ci, q = args
        logu = jnp.log(
            jax.random.uniform(
                jax.random.fold_in(key, ci), (qc, n_cand),
                minval=jnp.finfo(jnp.float32).tiny, maxval=1.0,
            )
        )  # in (-inf, 0)
        if uniform_shuffle:
            # any monotone map of iid uniforms is a plain shuffle
            # (small-cloud path, utils.py:221-226)
            scores = logu
        else:
            d = jnp.sqrt(_pairwise_sqdist(q, cand_pts))
            dmax = jnp.max(
                jnp.where(invalid, NEG_INF, d), axis=1, keepdims=True
            )
            w = jnp.clip(1.0 - 1.5 * d / dmax, 0.05, 1.0)
            # Efraimidis–Spirakis keys: top-k of log(u)/w selects the same
            # set as the Gumbel form log(w) + (-log(-log u)) — both rank by
            # w/Exp(1) — at a third of the transcendental cost (one log
            # instead of two nested logs plus log w). VPU-bound stage.
            scores = logu / w
        scores = jnp.where(invalid, NEG_INF, scores)
        v, i = _top_k(scores, sub_n, cfg.exact, cfg.recall_target)
        return i, v

    num_chunks = b // qc
    ids, v = jax.lax.map(
        chunk, (jnp.arange(num_chunks), queries.reshape(num_chunks, qc, 3))
    )
    ids = ids.reshape(b, sub_n).astype(jnp.int32)
    if cols is not None:
        ids = cols[ids]
    return ids, ~jnp.isfinite(v.reshape(b, sub_n))


@functools.partial(
    jax.jit, static_argnames=("cfg", "train", "small_cloud", "coherent")
)
def extract_patches(
    points: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    key: jax.Array,
    *,
    cfg: PatchConfig,
    train: bool,
    small_cloud: bool = False,
    coherent: bool = True,
):
    """Extract network-ready patches for a batch of query points.

    Args:
      points: (N, 3) device-resident point cloud (model space), padded.
      queries: (B, 3) query points (model space).
      n_valid: scalar int32 valid-point count.
      key: PRNG key; consumed for ball-subset choice, sub-sampling, and
        train-time rotation augmentation.
      cfg: static :class:`PatchConfig`.
      train: static; enables the reference's random-rotation augmentation
        (data_loader.py:381-393).
      small_cloud: static; True when n_valid < sub_sample_size (switches
        sub-sampling to the shuffle+zero-pad path, utils.py:221-226).
      coherent: static; False when the caller knows queries are spatially
        spread (e.g. GT-eval points), skipping the tile attempt whose
        certificates would fail anyway.

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
    k_sel, k_sub, k_aug = jax.random.split(key, 3)
    sub_key = jax.random.key(42) if cfg.fixed_subsample else k_sub
    # utils.py:210-211 pins the sub-sample RNG to seed 42 in fixed mode

    # ---- patch selection ----
    # eval/reconstruction (train=False): Morton tiles + certificate with
    # whole-batch dense fallback -> exact (kNN) / distribution-exact
    # (ball), fast when queries are spatially coherent (grid sweeps).
    # training (train=True): batches are random surface patches with
    # little coherence, and selection noise is harmless augmentation ->
    # cheap dense approx (recall ~0.95).
    tile_m = (
        min(cfg.tile_candidates, n) if cfg.knn_mode
        else _ball_tile_candidates(cfg, n)
    )
    use_tiles = (
        not cfg.exact
        and not train
        and coherent  # callers with spread queries (GT eval) skip tiles
        and n > 2 * tile_m
        and b >= 64
    )
    # approx per-query selection for coherent kNN eval sweeps — DEFAULT ON
    # since the round-5 reconstruction-grade gate (12-shape grid-256 A/B
    # vs exact: per-shape HD/Chamfer within sampling noise, GT-eval MSE
    # bit-identical — docs/VALIDATION.md round 5; ~4 ms/batch saved at
    # batch 4096). Read once at trace time; P2S_EVAL_APPROX_SELECT=0
    # restores exact selection. Spread GT-eval queries (coherent=False),
    # training, and --exact_patch_sampling keep exact selection either way.
    import os as _os

    approx_eval = (
        cfg.knn_mode
        and coherent
        and not train  # training keeps exact selection (gate covers eval)
        and not cfg.exact
        and _os.environ.get("P2S_EVAL_APPROX_SELECT", "1") == "1"
    )
    if use_tiles:
        tile = min(cfg.tile_queries, b)
        pad_rows = (-b) % tile
        q_sel = (
            jnp.concatenate(
                [queries, jnp.broadcast_to(queries[:1], (pad_rows, 3))]
            )
            if pad_rows
            else queries
        )
        t_ids, t_sqd, t_pad, all_cert = _tile_select(
            points, q_sel, n_valid, k, cfg, tile, k_sel, m=tile_m,
            approx_eval=approx_eval,
        )
        if pad_rows:
            t_ids, t_sqd, t_pad = t_ids[:b], t_sqd[:b], t_pad[:b]
        # one whole-batch cond (a per-tile cond inside lax.map lowers to
        # "execute both branches"): any uncertified tile -> recompute the
        # entire batch against the full cloud. kNN falls back to
        # high-recall approx selection (quality-neutral on
        # reconstructions, docs/VALIDATION); ball mode falls back to
        # EXACT top-k over the random priorities, because approx recall
        # loss there drops in-ball points from under-full (boundary)
        # balls rather than swapping near-equivalent neighbors.
        # Result: provably exact when tiles certify (typical for grid
        # sweeps), recall >=0.95 otherwise; --exact_patch_sampling gives
        # guaranteed-exact selection everywhere.
        ids, sqd, pad = jax.lax.cond(
            all_cert,
            lambda _: (t_ids, t_sqd, t_pad),
            lambda _: _dense_select(
                points, queries, n_valid, k, cfg, k_sel,
                approx_ok=cfg.knn_mode,
            ),
            None,
        )
    else:
        # kNN reconstruction sweeps that can't use tiles (clouds <= 2x the
        # candidate depth) pay a full exact top_k sort per query here; the
        # tile path's dense FALLBACK already accepts approx selection
        # (recall >= 0.95) for kNN eval as quality-neutral on
        # reconstructions, so P2S_EVAL_APPROX_SELECT offers the same trade
        # on this path (approx_eval hoisted above).
        ids, sqd, pad = _dense_select(
            points, queries, n_valid, k, cfg, k_sel,
            approx_ok=train or approx_eval,
        )

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

    # ---- global sub-sample ----
    if sub_n > 0:
        if cfg.uniform_subsample and not small_cloud:
            # randint WITH replacement (utils.py:213-216)
            uids = jax.random.randint(
                sub_key, (b, sub_n), 0, jnp.maximum(n_valid, 1)
            )
            sub = points[uids]
        else:
            sub_ids, sub_pad = _gumbel_subsample(
                points, queries, n_valid, sub_n, sub_key, cfg,
                small_cloud, uniform_shuffle=small_cloud,
            )
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
