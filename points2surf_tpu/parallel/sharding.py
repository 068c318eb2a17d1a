"""Parameter partitioning rules: data parallelism + tensor parallelism.

The model is small (~6-22M params) so replication (pure DP) is the default
and the fastest choice. For demonstration and for very large ``net_size``
configs, wide kernels can be sharded over the mesh's ``model`` axis
(tensor parallelism): each device holds a column shard of the big FC/conv
kernels and XLA inserts the activation collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(path, leaf, mesh: Mesh, min_dim: int = 512):
    """PartitionSpec for one parameter leaf.

    Kernels whose output dim is wide and divisible by the model axis get
    column-sharded (P(None, 'model')); biases/scales of matching width get
    sharded on their last axis; everything else is replicated.
    """
    n_model = mesh.shape.get("model", 1)
    if n_model <= 1:
        return P()
    last = leaf.shape[-1] if leaf.ndim else 1
    if last >= min_dim and last % n_model == 0:
        if leaf.ndim == 2:
            return P(None, "model")
        if leaf.ndim == 1:
            return P("model")
    return P()


def partition_params(params, mesh: Mesh, min_dim: int = 512):
    """Shard a param pytree: TP on wide kernels, replication elsewhere."""
    def put(path, leaf):
        spec = param_spec(path, leaf, mesh, min_dim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def partition_like(tree, params_template, mesh: Mesh, min_dim: int = 512):
    """Shard a pytree (e.g. optimizer momentum) with the same rule as the
    parameters it mirrors. Leaves that don't match any param shape are
    replicated."""
    def put(path, leaf):
        if hasattr(leaf, "shape") and leaf.ndim in (1, 2):
            spec = param_spec(path, leaf, mesh, min_dim)
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)
