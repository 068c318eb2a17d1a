"""Fused on-device patch extraction.

This is the TPU-native replacement for the reference's CPU hot loop —
``PointcloudPatchDataset.__getitem__`` (source/data_loader.py:322-421), which
runs a kd-tree query + numpy transforms per patch on DataLoader workers and
is the throughput ceiling of the original pipeline. Here the whole chain
(neighbor select -> pad-with-query -> adaptive radius -> patch-space
normalize -> global sub-sample -> rotation augmentation) is one jitted,
fixed-shape XLA program operating on a batch of queries against a
device-resident point cloud.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from points2surf_tpu.ops import geometry
from points2surf_tpu.ops.knn import patch_select
from points2surf_tpu.ops.subsample import subsample_batch


@dataclasses.dataclass(frozen=True)
class PatchConfig:
    """Static patch-extraction parameters (mirrors the reference CLI flags)."""

    points_per_patch: int = 300
    patch_radius: float = 0.0  # <= 0: kNN mode (data_loader.py:346-347)
    sub_sample_size: int = 1000
    uniform_subsample: bool = False
    fixed_subsample: bool = False
    chunk: int = 8192

    @property
    def knn_mode(self) -> bool:
        return self.patch_radius <= 0.0


@functools.partial(
    jax.jit, static_argnames=("cfg", "train", "small_cloud")
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
      small_cloud: static; True when n_valid < sub_sample_size.

    Returns:
      dict with the reference's batch keys (data_loader.py:395-404):
        patch_pts_ps (B,k,3), patch_radius_ms (B,), pts_sub_sample_ms (B,n,3),
        imp_surf_query_point_ms (B,3), imp_surf_query_point_ps (B,3),
        patch_pts_ids (B,k) int32 (debug plumbing, reference 'patch_pts_ids').
    """
    k_sel, k_sub, k_aug = jax.random.split(key, 3)

    ids, sqd, pad = patch_select(
        points,
        queries,
        n_valid,
        cfg.points_per_patch,
        radius=cfg.patch_radius,
        key=k_sel if not cfg.knn_mode else None,
        chunk=cfg.chunk,
        use_ball=not cfg.knn_mode,
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
        radius = jnp.full((queries.shape[0],), cfg.patch_radius, jnp.float32)

    patch_pts_ps = geometry.model_space_to_patch_space(
        patch_pts_ms, queries, radius
    )

    if cfg.sub_sample_size > 0:
        sub_key = (
            jax.random.key(42) if cfg.fixed_subsample else k_sub
        )  # utils.py:210-211 pins the sub-sample RNG to seed 42
        sub = subsample_batch(
            points,
            queries,
            n_valid,
            cfg.sub_sample_size,
            sub_key,
            mode="uniform" if cfg.uniform_subsample else "dist_weighted",
            small_cloud=small_cloud,
            chunk=cfg.chunk,
        )
    else:
        sub = jnp.zeros((queries.shape[0], 0, 3), jnp.float32)

    query_ms = queries
    # (q - q)/r == 0 identically (utils.py:72-77 applied to the query itself)
    query_ps = jnp.zeros_like(queries)

    if train:
        rot = geometry.random_rotation(k_aug, (queries.shape[0],))
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
