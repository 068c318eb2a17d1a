"""Pallas kernel: fused pointwise-MLP chain + symmetric pool (eval mode).

The PointNet trunks apply a chain of pointwise linear+BN(+relu) layers to
every point and pool over the point axis (reference model.py:41-49 /
:200-212). At eval, XLA runs each layer as its own dot and materializes
every intermediate activation in HBM; this kernel keeps the whole chain
in VMEM per tile and only writes the (B, C_out) pooled result.

STATUS — measured NEGATIVE result, default-OFF (P2S_EVAL_CHAIN=1 to
enable): the round-1 version LOST to XLA (25 vs 11.4 ms) on full-f32
MXU passes; this round-5 rewrite fixed that (bf16 dot operands / f32
accumulation — XLA's own default-precision numerics class), added
folded eval-BN affines, ragged-n masking, the sum-pool variant, the
SPMD wrapper, and the n-resident ``inner`` layout — and STILL loses
~1.85x (18.6 vs 10.1 ms standalone; 108.8 vs 61.6 ms in the full
forward, rel 8.5e-05 numerics). Per-grid-step overhead is falsified
(n-resident: 8-11x fewer steps, only ~11% faster); the residual cost is
the dependent dot->affine->relu sub-chains on M=1024-2048 row tiles,
which serialize MXU/VPU work that XLA's M=4M-row literal GEMMs overlap.
Full analysis: docs/PERFORMANCE.md round 5. Kept as tested machinery
and the recorded evidence that the eval forward is architecture-bound.

Grid-reduction layout (same as ops/pallas/train_tail.py): grid =
(B tiles, n chunks); the output block index ignores the n-chunk
coordinate, so the running max/sum stays resident in VMEM across the
reduction dimension while the pipeline double-buffers incoming chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -1e30

# Introspection mirror of train_tail.PARTITION_AXES_SEEN: appended each
# time the SHARDED eval-chain partition rule lowers per-shard.
PARTITION_AXES_SEEN: list = []


def _chain_kernel(x_ref, *refs, n_layers: int, n_valid: int, tn: int,
                  inner: int, grid_n: int, sym_op: str, relu_last: bool,
                  bf16_operands: bool):
    # refs: (w, a, c) per layer, then o_ref. Per layer: y = (h @ w) * a + c
    # (a/c carry the folded eval-BN affine + conv bias), relu between
    # layers, optional relu on the last, then max/sum over points.
    o_ref = refs[-1]
    j = pl.program_id(1)
    tb, _, cin = x_ref.shape
    cout = o_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        o_ref[:, :] = (
            jnp.full((tb, cout), NEG_LARGE, jnp.float32)
            if sym_op == "max"
            else jnp.zeros((tb, cout), jnp.float32)
        )

    acc = None
    for s in range(tn // inner):
        h = x_ref[:, s * inner:(s + 1) * inner, :].reshape(tb * inner, cin)
        for li in range(n_layers):
            w = refs[3 * li][:, :]
            a = refs[3 * li + 1][0, :]
            c = refs[3 * li + 2][0, :]
            if bf16_operands:
                # XLA's DEFAULT matmul precision class (bf16 operand
                # rounding, f32 accumulation) — what the literal eval
                # layer stack runs at on TPU. Full-f32 passes cost ~4x
                # and were why the round-1 kernel lost (module docstring).
                h = h.astype(jnp.bfloat16)
                w = w.astype(jnp.bfloat16)
            h = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = h * a[None, :] + c[None, :]
            if li < n_layers - 1 or relu_last:
                h = jnp.maximum(h, 0.0)

        y = h.reshape(tb, inner, cout)
        # mask rows past n_valid (wrapper's point-axis padding). With a
        # single n-grid step the row range is static per sub-chunk, so
        # fully-valid sub-chunks skip the iota/select VPU work entirely.
        if grid_n == 1 and (s + 1) * inner <= n_valid:
            pass
        else:
            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (tb, inner, cout), 1)
                + (j * tn + s * inner)
            )
            valid = rows < n_valid
            y = jnp.where(valid, y,
                          NEG_LARGE if sym_op == "max" else 0.0)
        part = jnp.max(y, axis=1) if sym_op == "max" else jnp.sum(y, axis=1)
        if acc is None:
            acc = part
        elif sym_op == "max":
            acc = jnp.maximum(acc, part)
        else:
            acc = acc + part
    if sym_op == "max":
        o_ref[:, :] = jnp.maximum(o_ref[:, :], acc)
    else:
        o_ref[:, :] = o_ref[:, :] + acc


def _chain_literal(x, layers, sym_op, relu_last):
    """XLA reference/fallback with identical semantics to the kernel."""
    h = x
    n_layers = len(layers)
    for li, (w, a, c) in enumerate(layers):
        h = jnp.einsum("bnc,cd->bnd", h, w) * a[None, None, :] + c
        if li < n_layers - 1 or relu_last:
            h = jnp.maximum(h, 0.0)
    return jnp.max(h, axis=1) if sym_op == "max" else jnp.sum(h, axis=1)


def supported(x: jax.Array) -> bool:
    """Platform/shape gate: TPU backend, batch tileable by 8."""
    return (
        x.ndim == 3
        and x.shape[0] % 8 == 0
        and jax.default_backend() != "cpu"
    )


def chain_pool(
    x: jax.Array,
    layers,
    *,
    sym_op: str = "max",
    relu_last: bool = False,
    tb: int = 8,
    tn: int = 128,
    inner: int | None = None,
    interpret: bool = False,
    bf16_operands: bool | None = None,
):
    """Pool over points of a fused pointwise-MLP chain.

    Computes ``pool_n(L_k(relu(...relu(L_1(x))...)))`` with
    ``L_i(h) = (h @ W_i) * a_i + c_i`` — ``a_i``/``c_i`` carry the folded
    inference BatchNorm affine and conv bias (see ``fold_conv_bn``) —
    for x of shape (B, n, Cin); pool is max or sum (``sym_op``).

    ``layers`` is a static-length sequence of (w, a, c) triples. The point
    axis may be ragged (padded to the tile size internally and masked);
    a channel count below 8 is zero-padded to 8 (zero weight rows make
    the padding inert). Falls back to plain XLA when B % tb != 0.

    ``inner`` switches to the n-resident layout: the WHOLE (padded) point
    axis is one grid block, and the kernel walks it in ``inner``-point
    sub-chunks (registers carry the running pool). Grid steps drop from
    B/tb * n/tn to B/tb, amortizing per-step overheads that dominate at
    tb=8/tn=128 (docs/PERFORMANCE.md round 5). Keep tb*inner*cout*4 well
    under VMEM (~16 MB).

    Returns (B, C_out) float32.
    """
    import os

    if bf16_operands is None:
        bf16_operands = (
            os.environ.get("P2S_EVAL_CHAIN_PREC", "default") != "highest"
        )
    layers = tuple(
        (w, jnp.ones((w.shape[1],), jnp.float32) if a is None else a, c)
        for (w, a, c) in layers
    )
    return _chain_pool(
        x, layers, sym_op=sym_op, relu_last=relu_last, tb=tb, tn=tn,
        inner=inner, interpret=interpret,
        bf16_operands=bool(bf16_operands),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sym_op", "relu_last", "tb", "tn", "inner", "interpret",
        "bf16_operands",
    ),
)
def _chain_pool(x, layers, *, sym_op, relu_last, tb, tn, inner, interpret,
                bf16_operands):
    if sym_op not in ("max", "sum"):
        raise ValueError(f"unsupported sym_op: {sym_op}")
    b, n, cin = x.shape
    cout = layers[-1][0].shape[1]
    if b % tb != 0:
        return _chain_literal(x, layers, sym_op, relu_last)

    if cin < 8:
        # zero-pad the input channels to the sublane width; zero weight
        # rows keep the result exact
        w0, a0, c0 = layers[0]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 8 - cin)))
        w0 = jnp.pad(w0, ((0, 8 - cin), (0, 0)))
        layers = ((w0, a0, c0),) + tuple(layers[1:])
        cin = 8
    if inner is not None:
        # n-resident layout: one n-grid step, sub-chunked in registers
        tn = -(-n // inner) * inner
    else:
        inner = tn
    n_pad = -(-n // tn) * tn
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    grid = (b // tb, n_pad // tn)
    in_specs = [
        pl.BlockSpec((tb, tn, cin), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x]
    for w, a, c in layers:
        ci, co = w.shape
        for arr, spec in (
            (w, pl.BlockSpec((ci, co), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)),
            (a.reshape(1, -1), pl.BlockSpec((1, co), lambda i, j: (0, 0),
                                            memory_space=pltpu.VMEM)),
            (c.reshape(1, -1), pl.BlockSpec((1, co), lambda i, j: (0, 0),
                                            memory_space=pltpu.VMEM)),
        ):
            in_specs.append(spec)
            args.append(arr)
    return pl.pallas_call(
        functools.partial(
            _chain_kernel, n_layers=len(layers), n_valid=n, tn=tn,
            inner=inner, grid_n=n_pad // tn, sym_op=sym_op,
            relu_last=relu_last, bf16_operands=bf16_operands,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, cout), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def chain_pool_sharded(x, layers, *, sym_op="max", relu_last=False,
                       interpret=False):
    """Data-parallel wrapper: batch-dim SPMD partitioning for the kernel.

    Same design as train_tail.pooled_tail_reductions_sharded: pallas_call
    has no partitioning rule, so this registers the natural one — x and
    the pooled output shard on the batch dimension, all layer params
    replicate, each device runs the kernel on its batch shard (the point
    axis is unsharded, so masks/pools are already global per shard).
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    flat = []
    for w, a, c in layers:
        flat.extend([
            w,
            jnp.ones((w.shape[1],), jnp.float32) if a is None else a,
            c,
        ])

    @custom_partitioning
    def _call(x, *params):
        lys = tuple(
            (params[3 * i], params[3 * i + 1], params[3 * i + 2])
            for i in range(len(params) // 3)
        )
        return chain_pool(x, lys, sym_op=sym_op, relu_last=relu_last,
                          interpret=interpret)

    def _batch_axis(arg_infos):
        spec = getattr(arg_infos[0].sharding, "spec", None)
        if spec is None or len(spec) == 0:
            return None
        return spec[0]

    def partition(mesh, arg_infos, result_infos):
        axis = _batch_axis(arg_infos)
        PARTITION_AXES_SEEN.append(axis)
        arg_shardings = (NamedSharding(mesh, P(axis, None, None)),) + tuple(
            NamedSharding(mesh, P(*([None] * arg_infos[k].ndim)))
            for k in range(1, len(arg_infos))
        )
        out_shardings = NamedSharding(mesh, P(axis, None))

        def lower_fn(xs, *params):
            lys = tuple(
                (params[3 * i], params[3 * i + 1], params[3 * i + 2])
                for i in range(len(params) // 3)
            )
            return chain_pool(xs, lys, sym_op=sym_op, relu_last=relu_last,
                              interpret=interpret)

        return mesh, lower_fn, out_shardings, arg_shardings

    # Shardy rule: only the batch factor may shard; point/channel factors
    # replicate (the kernel consumes the full point axis per shard).
    n_layers = len(layers)
    terms = ["b n c0"]
    for i in range(n_layers):
        terms.append(f"c{i} d{i}")
        terms.append(f"d{i}")
        terms.append(f"d{i}")
    rule = ", ".join(terms) + f" -> b d{n_layers - 1}"
    # Shardy requires the special (replicated) factors listed in order of
    # first appearance in the rule
    factors = ["n", "c0"]
    for i in range(n_layers):
        factors.extend([f"d{i}", f"c{i + 1}"])
    factors = [f for f in factors if f != f"c{n_layers}"]
    _call.def_partition(
        partition,
        sharding_rule=rule,
        need_replication_factors=tuple(dict.fromkeys(factors)),
    )
    return _call(x, *flat)


def fold_conv_bn(kernel, cbias, scale, bbias, mean, var, eps: float = 1e-5):
    """Eval-mode (conv bias + BatchNorm) -> per-channel affine (a, c).

    ``bn(x @ W + b) == (x @ W) * a + c`` with running stats (mean, var)
    and BN affine (scale, bbias):  a = scale/sqrt(var+eps),
    c = bbias + (b - mean) * a. The conv weights W pass through UNCHANGED
    so the kernel's bf16 operand rounding matches the literal path's.
    """
    a = scale.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps
    )
    c = bbias.astype(jnp.float32) + (
        cbias.astype(jnp.float32) - mean.astype(jnp.float32)
    ) * a
    return a, c


def chain3_maxpool(
    x: jax.Array,
    w1: jax.Array, c1: jax.Array,
    w2: jax.Array, c2: jax.Array,
    w3: jax.Array, c3: jax.Array,
    *,
    relu_last: bool = False,
    tb: int = 8,
    nc: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Back-compat wrapper: 3-layer chain, bias-only affines, max pool.

    Exercised by tests/test_pallas.py; production goes through
    ``chain_pool`` (models/pointnet.py eval path).
    """
    return chain_pool(
        x,
        ((w1, None, c1), (w2, None, c2), (w3, None, c3)),
        sym_op="max", relu_last=relu_last, tb=tb, tn=nc,
        interpret=interpret, bf16_operands=False,
    )
