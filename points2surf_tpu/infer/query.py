"""Fused SDF query step: patch extraction + model forward + post-processing
as ONE jitted program.

This is the production inference path for reconstruction: a batch of query
points against a device-resident cloud, returning model-space signed
distances. Keeping it a single XLA program avoids host round-trips between
extraction and forward (the reference pays a process boundary + H2D per
batch here, points_to_surf_eval.py:358-373).
"""

from __future__ import annotations

import functools

import jax

from points2surf_tpu.models import losses as L
from points2surf_tpu.ops.patches import PatchConfig, extract_patches


def drain_batched_results(pending, n_total: int, group: int = 64):
    """Fetch a list of equal-shape (B,) device arrays as ONE host array.

    Concatenates on device in fixed-arity groups of ``group`` (padding the
    last group by repeating its final array) so XLA compiles exactly one
    concat program regardless of how many batches a shape produced, and the
    host pays ceil(n/group) round-trips instead of one per batch (~27 ms
    each through a tunneled chip; large grids run 500+ batches per shape).
    """
    import numpy as np
    import jax.numpy as jnp

    if not pending:
        return np.empty(0, np.float32)
    b = pending[0].shape[0]
    if any(p.shape != pending[0].shape for p in pending):
        raise ValueError(
            "drain_batched_results requires equal-shape batches; pad the "
            f"final batch to {pending[0].shape} before draining "
            f"(got shapes {sorted({tuple(p.shape) for p in pending})})"
        )
    res = np.empty(len(pending) * b, np.float32)
    off = 0
    for g in range(0, len(pending), group):
        gr = pending[g : g + group]
        n_real = len(gr)
        if n_real < group:
            gr = gr + [gr[-1]] * (group - n_real)
        cat = np.asarray(jnp.concatenate(gr))
        res[off : off + n_real * b] = cat[: n_real * b]
        off += n_real * b
    return res[:n_total]


def make_sdf_query_fn(model, outputs, patch_cfg: PatchConfig,
                      fixed_radius: bool, augment: bool = False,
                      mesh=None, coherent: bool = True):
    """Returns jitted fn(params, batch_stats, points, queries, n_valid, key)
    -> (B,) model-space signed distances.

    With ``mesh``, the query batch is sharded over the mesh's ``data`` axis
    and the cloud/params replicated — the multi-chip reconstruction sweep
    (SURVEY §2.4 'sharded inference map'); XLA partitions the whole fused
    program, so each chip extracts and evaluates only its B/n_chips slice.
    """
    outputs = tuple(outputs)

    @functools.partial(jax.jit, static_argnames=("small_cloud",))
    def _query(params, batch_stats, points, queries, n_valid, key,
               small_cloud: bool = False):
        batch = extract_patches(
            points, queries, n_valid, key,
            cfg=patch_cfg, train=augment, small_cloud=small_cloud,
            coherent=coherent,
        )
        pred = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, False
        )
        radius = batch["patch_radius_ms"]
        dim = 0
        dist = None
        mag = None
        sign = None
        for o in outputs:
            if o == "imp_surf":
                d = L.post_process_distance(pred[:, dim])
                dist = d * radius if not fixed_radius else d
                dim += 1
            elif o == "imp_surf_magnitude":
                m = L.post_process_magnitude(pred[:, dim])
                mag = m * radius if not fixed_radius else m
                dim += 1
            elif o == "imp_surf_sign":
                sign = L.post_process_sign(pred[:, dim])
                dim += 1
        if dist is None:
            dist = mag * sign
        return dist

    if mesh is None:
        return _query

    from jax.sharding import NamedSharding, PartitionSpec as P

    q_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def sharded_query(params, batch_stats, points, queries, n_valid, key,
                      small_cloud: bool = False):
        if queries.shape[0] % mesh.shape["data"] == 0:
            queries = jax.device_put(queries, q_sharding)
            points = jax.device_put(points, rep)
        return _query(params, batch_stats, points, queries, n_valid, key,
                      small_cloud=small_cloud)

    return sharded_query
