"""Pallas kernel: train-mode pooled-tail reductions in one pass.

The train-mode pooled tails (models/pointnet.py `_pooled_tail`) need,
from ``c = x @ W + b`` with x (B, n, Cin):

  cmax/argmax and cmin/argmin over n   (max-pool value + VJP routing)
  per-row sum over n                   (sum-pool value / BN statistics)
  per-row sum of squares over n        (BN statistics)

XLA fuses a dot with ONE reduction consumer into the matmul epilogue,
but with four consumers it materializes the full (B, n, C) activation —
f32[1000, 1300, 1024] = 5.3 GB written + four reduction reads per tail,
~27 GB of HBM traffic across the five tails of the flagship model (the
dominant cost of the f32 train step, docs/PERFORMANCE.md round 3). This
kernel streams the point axis through VMEM and accumulates all six
outputs in registers, so the wide activation never touches HBM:

  grid = (B/tb, ceil(n/tn)); the n axis revisits the same output block
  (TPU grids execute sequentially, so read-modify-write accumulation
  across the j axis is sound); rows past n_valid are masked.

The backward stays the existing analytic custom VJP (`_lpr_bwd`) — it
consumes only (x, W, b, argmax, argmin, mean), never the activation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_LARGE = -1e30
POS_LARGE = 1e30

# Introspection for artifact-level proofs (__graft_entry__.dryrun_multichip):
# partition() appends the resolved batch-axis name each time GSPMD invokes
# the custom_partitioning rule — i.e. each time the SHARDED kernel path is
# actually lowered per-shard rather than falling back to XLA.
PARTITION_AXES_SEEN: list = []


def _kernel(x_ref, w_ref, b_ref,
            cmax_ref, amax_ref, cmin_ref, amin_ref, rsum_ref, rsq_ref,
            *, n_valid: int, tn: int, bf16_operands: bool):
    j = pl.program_id(1)
    tb, _, cin = x_ref.shape
    c = w_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        cmax_ref[:, :] = jnp.full((tb, c), NEG_LARGE, jnp.float32)
        amax_ref[:, :] = jnp.zeros((tb, c), jnp.int32)
        cmin_ref[:, :] = jnp.full((tb, c), POS_LARGE, jnp.float32)
        amin_ref[:, :] = jnp.zeros((tb, c), jnp.int32)
        rsum_ref[:, :] = jnp.zeros((tb, c), jnp.float32)
        rsq_ref[:, :] = jnp.zeros((tb, c), jnp.float32)

    xs = x_ref[:, :, :].reshape(tb * tn, cin)
    ws = w_ref[:, :]
    if bf16_operands:
        # match XLA's DEFAULT matmul precision (bf16 operand rounding,
        # f32 accumulation) — the numerics class of the literal layer
        # stack and the XLA fused-tail fallback this kernel replaces. A
        # full-f32 MXU pass costs ~4x the bf16 rate and was the kernel's
        # dominant cost (docs/PERFORMANCE.md round 3, bf16-operand A/B).
        xs = xs.astype(jnp.bfloat16)
        ws = ws.astype(jnp.bfloat16)
    y = jnp.dot(xs, ws, preferred_element_type=jnp.float32)
    y = y.reshape(tb, tn, c) + b_ref[0, :][None, None, :]

    # mask rows past n_valid (block padding + caller's point padding)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tb, tn, c), 1) + j * tn
    valid = rows < n_valid

    ymax = jnp.where(valid, y, NEG_LARGE)
    chunk_max = jnp.max(ymax, axis=1)
    chunk_amax = jnp.argmax(ymax, axis=1).astype(jnp.int32) + j * tn
    take = chunk_max > cmax_ref[:, :]
    cmax_ref[:, :] = jnp.where(take, chunk_max, cmax_ref[:, :])
    amax_ref[:, :] = jnp.where(take, chunk_amax, amax_ref[:, :])

    ymin = jnp.where(valid, y, POS_LARGE)
    chunk_min = jnp.min(ymin, axis=1)
    chunk_amin = jnp.argmin(ymin, axis=1).astype(jnp.int32) + j * tn
    take = chunk_min < cmin_ref[:, :]
    cmin_ref[:, :] = jnp.where(take, chunk_min, cmin_ref[:, :])
    amin_ref[:, :] = jnp.where(take, chunk_amin, amin_ref[:, :])

    yz = jnp.where(valid, y, 0.0)
    rsum_ref[:, :] = rsum_ref[:, :] + jnp.sum(yz, axis=1)
    rsq_ref[:, :] = rsq_ref[:, :] + jnp.sum(yz * yz, axis=1)


def supported(x: jax.Array, kernel: jax.Array) -> bool:
    """Shape/platform gate: (B, n, Cin) @ (Cin, C) with MXU-friendly dims."""
    if x.ndim != 3 or kernel.ndim != 2:
        return False
    b, _, cin = x.shape
    c = kernel.shape[1]
    return (
        b % 8 == 0
        and cin % 128 == 0
        and c % 128 == 0
        and jax.default_backend() != "cpu"
    )


def pooled_tail_reductions(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    tb: int | None = None,
    tn: int = 128,
    interpret: bool = False,
    bf16_operands: bool | None = None,
):
    """Resolve the matmul-precision gate OUTSIDE the jitted body so an env
    flip between calls retraces instead of reusing a stale cache entry."""
    import os

    if bf16_operands is None:
        bf16_operands = (
            os.environ.get("P2S_PALLAS_TAIL_PREC", "default") != "highest"
        )
    return _pooled_tail_reductions(
        x, w, b, tb=tb, tn=tn, interpret=interpret,
        bf16_operands=bool(bf16_operands),
    )


@functools.partial(
    jax.jit,
    static_argnames=("tb", "tn", "interpret", "bf16_operands"),
)
def _pooled_tail_reductions(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    tb: int | None = None,
    tn: int = 128,
    interpret: bool = False,
    bf16_operands: bool = True,
):
    """All pooled-tail reductions of ``x @ w + b`` in one streaming pass.

    Returns (cmax, amax, cmin, amin, rsum, rsq), each (B, C) — f32 except
    the int32 arg indices. Rows are the ragged point axis; no padding
    contract is imposed on the caller (block padding is masked). ``tb``
    defaults to the largest divisor of B up to 8 (per-shard batch sizes
    under data parallelism are not always multiples of 8; smaller tiles
    sublane-pad but stay correct).
    """
    bsz, n, cin = x.shape
    c = w.shape[1]
    if tb is None:
        tb = next(t for t in (8, 7, 6, 5, 4, 3, 2, 1) if bsz % t == 0)
    if bsz % tb != 0:
        raise ValueError(f"batch {bsz} not divisible by tile {tb}")
    grid = (bsz // tb, pl.cdiv(n, tn))
    bc = lambda i, j: (i, 0)  # noqa: E731 — revolving (tb, C) output block
    out = pl.pallas_call(
        functools.partial(_kernel, n_valid=n, tn=tn,
                          bf16_operands=bf16_operands),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tn, cin), lambda i, j: (i, j, 0)),
            pl.BlockSpec((cin, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tb, c), bc),
            pl.BlockSpec((tb, c), bc),
            pl.BlockSpec((tb, c), bc),
            pl.BlockSpec((tb, c), bc),
            pl.BlockSpec((tb, c), bc),
            pl.BlockSpec((tb, c), bc),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c), jnp.int32),
            jax.ShapeDtypeStruct((bsz, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c), jnp.int32),
            jax.ShapeDtypeStruct((bsz, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, w, b.reshape(1, -1))
    return out


def pooled_tail_reductions_sharded(
    x: jax.Array, w: jax.Array, b: jax.Array, *, interpret: bool = False
):
    """Data-parallel wrapper: batch-dim SPMD partitioning for the kernel.

    ``pallas_call`` has no partitioning rule, so under a multi-device
    mesh XLA would gather the operands onto one device. This wrapper
    registers the natural rule via ``custom_partitioning``: x and all
    six outputs shard on the batch dimension, w/b replicate, and each
    device runs the kernel on its batch shard (arg indices address the
    unsharded point axis, so they are already global). Default-ON on
    meshes since round 5 (P2S_PALLAS_TAIL_SHARDED=0 opts out): the rule
    is validated per-shard on the virtual CPU mesh in interpret mode
    (dryrun_multichip, XLA A/B rel 1.3e-06) and the real kernel inside
    a real-chip mesh context by scripts/probe_sharded_tail.py.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    @custom_partitioning
    def _call(x, w, b):
        return pooled_tail_reductions(x, w, b, interpret=interpret)

    def _batch_axis(arg_infos):
        sh = arg_infos[0].sharding
        spec = getattr(sh, "spec", None)
        if spec is None or len(spec) == 0:
            return None
        return spec[0]

    def partition(mesh, arg_infos, result_infos):
        axis = _batch_axis(arg_infos)
        PARTITION_AXES_SEEN.append(axis)
        arg_shardings = (
            NamedSharding(mesh, P(axis, None, None)),
            NamedSharding(mesh, P(None, None)),
            NamedSharding(mesh, P(None)),
        )
        out_shardings = tuple(
            NamedSharding(mesh, P(axis, None)) for _ in range(6)
        )

        def lower_fn(xs, ws, bs):
            return pooled_tail_reductions(xs, ws, bs, interpret=interpret)

        return mesh, lower_fn, out_shardings, arg_shardings

    # Shardy-style propagation rule: only the batch factor may shard;
    # the point/contraction/channel factors must replicate (the kernel
    # consumes full n/Cin/C per shard)
    _call.def_partition(
        partition,
        sharding_rule="b n i, i j, j -> b j, b j, b j, b j, b j, b j",
        need_replication_factors=("n", "i", "j"),
    )
    return _call(x, w, b)
