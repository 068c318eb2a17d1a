"""Multi-host (DCN) setup.

One call at program start turns any driver into a multi-host SPMD program:
`jax.distributed.initialize` wires the hosts together, after which
`jax.devices()` spans all chips in the slice and the existing mesh/sharding
code scales unchanged (batch sharded over 'data' across hosts; each host
feeds its own addressable shard — see shard_host_batch).

This is the DCN half of the communication story in SURVEY §2.4; the
reference has no multi-host equivalent (DataParallel is single-process).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX when running under a multi-process launch.

    No-ops (returns False) in single-process runs so drivers can call it
    unconditionally. Arguments default to the standard JAX env vars /
    cluster auto-detection.
    """
    explicit = coordinator_address is not None or (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    in_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if not explicit and not in_tpu_pod:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def shard_host_batch(global_indices: np.ndarray,
                     multiple_of: int = 1) -> np.ndarray:
    """Slice a global batch-index array down to this host's share.

    Each host loads only the patches its addressable devices will consume;
    ``mesh.shard_batch(..., from_host_shard=True)`` then assembles the
    global array without cross-host data movement.

    ``multiple_of``: round the per-host share down to this multiple so the
    global row count stays divisible by the mesh's data axis on ragged
    final batches (callers pass data_axis // process_count).
    """
    n = jax.process_count()
    i = jax.process_index()
    per = len(global_indices) // n
    per -= per % max(multiple_of, 1)
    return global_indices[i * per : (i + 1) * per]


def shard_host_tree(batch: dict, multiple_of: int = 1) -> dict:
    """Per-host slice of every leading-axis array in a batch dict."""
    return jax.tree_util.tree_map(
        lambda x: shard_host_batch(x, multiple_of), batch
    )


def is_main_process() -> bool:
    """True on the process that should write checkpoints/logs/reports."""
    return jax.process_index() == 0
