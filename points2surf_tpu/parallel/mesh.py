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


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Shard every array's leading (batch) axis over the 'data' axis.

    Ragged final batches that don't divide the data axis fall back to
    replication (rare: one batch per epoch at most).
    """
    n_data = mesh.shape["data"]

    def put(x):
        if x.ndim >= 1 and x.shape[0] % n_data == 0:
            spec = P("data", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (parameters, opt state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
