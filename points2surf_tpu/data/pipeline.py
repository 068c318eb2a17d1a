"""Host->device patch pipeline: turns sampler indices into device batches.

The reference feeds the GPU from N CPU DataLoader workers, each running a
kd-tree query + numpy transforms per patch (source/data_loader.py:322-421,
source/points_to_surf_train.py:332-338). Here the host only does index
bookkeeping: batch indices are grouped into per-shape runs, each run is
extracted by the fused on-device program (:func:`extract_patches`) against
the device-resident cloud, and the runs are re-assembled into the exact
batch on device with a single gather. GT distances are tiny host arrays
shipped alongside.

Run lengths are padded to power-of-two buckets so the jit cache stays small;
with the paper's `random_shape_consecutive` ordering nearly every batch is a
single full-size run.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from points2surf_tpu.data.shapes import ShapeStore
from points2surf_tpu.ops.patches import PatchConfig, extract_patches

_BATCH_KEYS = (
    "patch_pts_ps",
    "patch_radius_ms",
    "pts_sub_sample_ms",
    "imp_surf_query_point_ms",
    "imp_surf_query_point_ps",
    "patch_pts_ids",
)


def _run_bucket(n: int) -> int:
    b = 64
    while b < n:
        b *= 2
    return b


class PatchPipeline:
    def __init__(
        self,
        store: ShapeStore,
        cfg: PatchConfig,
        *,
        augment: bool,
        seed: int = 0,
    ):
        self.store = store
        self.cfg = cfg
        self.augment = augment
        self._base_key = jax.random.key(seed)
        self._step = 0

    def next_key(self):
        """Advance and return the per-step PRNG key."""
        self._step += 1
        return jax.random.fold_in(self._base_key, self._step)

    def reset(self) -> None:
        """Restart the RNG stream (reference --identical_epochs semantics:
        the same patches AND the same random draws every epoch,
        points_to_surf_train.py:99-100, data_loader.py:332-333)."""
        self._step = 0

    def _extract_run(self, shape_ind: int, local_inds: np.ndarray):
        pts_dev, n_valid = self.store.device_points(shape_ind)
        shape = self.store.get(shape_ind)
        queries = shape.query_pts[local_inds]
        run_len = len(local_inds)
        bucket = _run_bucket(run_len)
        if bucket > run_len:
            queries = np.concatenate(
                [queries, np.repeat(queries[:1], bucket - run_len, axis=0)]
            )
        key = self.next_key()
        out = extract_patches(
            pts_dev,
            jnp.asarray(queries),
            n_valid,
            key,
            cfg=self.cfg,
            train=self.augment,
            small_cloud=n_valid < max(self.cfg.sub_sample_size, 1),
        )
        return out, run_len

    def plan(
        self, indices: Iterable[int], batch_size: int
    ) -> Iterator[tuple]:
        """Yield per-batch plans without extracting.

        Each item is either
          ('single', shape_ind, local_inds, gt) — whole batch from one
            shape (the common case under shape-consecutive ordering;
            enables extraction fused into the train step), or
          ('mixed', batch_dict) — assembled via the two-phase path.
        """
        idx = np.fromiter(indices, dtype=np.int64)
        offsets = np.cumsum([0] + self.store.shape_patch_count)
        for start in range(0, len(idx), batch_size):
            chunk = idx[start : start + batch_size]
            shape_inds = np.searchsorted(offsets, chunk, side="right") - 1
            if len(chunk) == batch_size and (shape_inds == shape_inds[0]).all():
                si = int(shape_inds[0])
                li = chunk - offsets[si]
                gt = self.store.get(si).query_dist[li]
                yield ("single", si, li, gt.astype(np.float32))
            else:
                yield ("mixed", self._assemble(chunk, True))

    def batches(
        self,
        indices: Iterable[int],
        batch_size: int,
        *,
        with_gt: bool = True,
        drop_last: bool = False,
    ) -> Iterator[dict]:
        """Yield device batch dicts for consecutive chunks of ``indices``.

        Each batch carries the model-input keys plus (when ``with_gt``)
        'imp_surf_ms', 'imp_surf_magnitude_ms', 'imp_surf_dist_sign_ms'
        matching the reference batch contract (data_loader.py:395-404).
        """
        idx = np.fromiter(indices, dtype=np.int64)
        for start in range(0, len(idx), batch_size):
            chunk = idx[start : start + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            yield self._assemble(chunk, with_gt)

    def _assemble(self, chunk: np.ndarray, with_gt: bool) -> dict:
        offsets = np.cumsum([0] + self.store.shape_patch_count)
        shape_inds = np.searchsorted(offsets, chunk, side="right") - 1
        local_inds = chunk - offsets[shape_inds]

        run_outputs = []
        take_ids = np.empty(len(chunk), np.int64)
        gt = np.empty(len(chunk), np.float32) if with_gt else None
        row_base = 0
        pos = 0
        # group into per-shape runs preserving order of first occurrence
        for si in _unique_stable(shape_inds):
            sel = shape_inds == si
            li = local_inds[sel]
            out, run_len = self._extract_run(int(si), li)
            run_outputs.append(out)
            take_ids[sel] = row_base + np.arange(run_len)
            if with_gt:
                shape = self.store.get(int(si))
                gt[sel] = shape.query_dist[li]
            row_base += out["patch_pts_ps"].shape[0]
            pos += run_len

        if len(run_outputs) == 1 and row_base == len(chunk):
            batch = dict(run_outputs[0])
        else:
            batch = _gather_runs(run_outputs, jnp.asarray(take_ids))

        if with_gt:
            # sign target: 0.0 strictly negative else 1.0
            # (reference data_loader.py:369-371)
            batch["imp_surf_ms"] = jnp.asarray(gt)
            batch["imp_surf_magnitude_ms"] = jnp.asarray(np.abs(gt))
            batch["imp_surf_dist_sign_ms"] = jnp.asarray(
                (gt >= 0.0).astype(np.float32)
            )
        return batch


def _unique_stable(arr: np.ndarray) -> np.ndarray:
    _, first = np.unique(arr, return_index=True)
    return arr[np.sort(first)]


@jax.jit
def _gather_runs(run_outputs: list, take_ids: jax.Array) -> dict:
    out = {}
    for k in _BATCH_KEYS:
        cat = jnp.concatenate([r[k] for r in run_outputs], axis=0)
        out[k] = jnp.take(cat, take_ids, axis=0)
    return out
