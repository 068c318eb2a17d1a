"""Device mesh setup and sharding helpers.

The communication story of this framework (SURVEY §2.4): a 1-D mesh over
all chips with axis ``data``; training batches sharded over ``data``,
parameters replicated; XLA inserts the gradient all-reduce over ICI. This
replaces the reference's single-process ``torch.nn.DataParallel``
(source/points_to_surf_train.py:413-414) — and because BatchNorm reductions
under GSPMD are global over the sharded batch, the reference's
DataParallel/BatchNorm pitfall (full_run.py:8-13) disappears.

An optional ``model`` axis enables tensor parallelism for the wide FC
layers (see parallel/sharding.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    *,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """1-D or 2-D device mesh: ('data',) or ('data', 'model')."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if data is None:
        data = len(devices) // model
    grid = devices[: data * model].reshape(data, model)
    return Mesh(grid, ("data", "model"))


def shard_batch(batch: dict, mesh: Mesh, *, from_host_shard: bool = False) -> dict:
    """Shard every array's leading (batch) axis over the 'data' axis.

    Single-process: a plain device_put with a NamedSharding. Multi-host
    (``jax.process_count() > 1``): each host passes ONLY ITS SLICE of the
    global batch (``from_host_shard=True``, see
    ``distributed.shard_host_batch``) and the global array is assembled
    with ``jax.make_array_from_process_local_data`` — no cross-host data
    movement, each host feeds its own addressable devices (the per-host
    data loading half of SURVEY §2.4's DCN story).

    Ragged batches that don't divide the data axis fall back to
    replication (rare: one batch per epoch at most; multi-host runs avoid
    this by dropping the remainder in shard_host_batch).
    """
    n_data = mesh.shape["data"]
    multi = jax.process_count() > 1
    n_proc = jax.process_count()

    def put(x):
        rows = x.shape[0] if x.ndim >= 1 else 0
        global_rows = rows * (n_proc if from_host_shard and multi else 1)
        if x.ndim >= 1 and global_rows % n_data == 0 and global_rows > 0:
            spec = P("data", *([None] * (x.ndim - 1)))
            sharding = NamedSharding(mesh, spec)
            if multi:
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)
                )
            return jax.device_put(x, sharding)
        if multi and from_host_shard:
            raise ValueError(
                "multi-host batches must divide the data axis "
                f"(got {global_rows} global rows over {n_data} devices)"
            )
        return replicate_array(x, mesh)

    return jax.tree_util.tree_map(put, batch)


def replicate_array(x, mesh: Mesh):
    """One fully-replicated global array (identical on every host)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        xnp = np.asarray(x)
        return jax.make_array_from_callback(
            xnp.shape, sharding, lambda idx: xnp[idx]
        )
    return jax.device_put(x, sharding)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (parameters, opt state)."""
    return jax.tree_util.tree_map(lambda x: replicate_array(x, mesh), tree)
