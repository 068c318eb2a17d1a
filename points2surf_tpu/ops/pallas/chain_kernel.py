"""Pallas kernel: fused pointwise-MLP chain + max-pool.

The PointNet trunks apply a chain of pointwise linear layers to every
point and max-pool over the point axis (reference model.py:41-49 /
:200-212). XLA must materialize each intermediate activation in HBM
((B, n, 64/128) arrays — gigabytes at reconstruction batch sizes); this
kernel keeps the whole chain in VMEM per tile and only ever writes the
(B, C_out) pooled result.

Grid-reduction layout: grid = (B tiles, n chunks); the output block index
ignores the n-chunk coordinate, so the running max stays resident in VMEM
across the reduction dimension while the pipeline double-buffers the
incoming point chunks.

Inference-mode BatchNorm folds into each layer (see
encoder_tail.fold_batchnorm): y = relu(x @ W_i + c_i) per layer, with the
final layer's ReLU optional (the main encoder pools bn3's output without
activation, reference model.py:203).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -1e30


def _chain_kernel(x_ref, w1_ref, c1_ref, w2_ref, c2_ref, w3_ref, c3_ref,
                  o_ref, *, relu_last: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:, :] = jnp.full_like(o_ref, NEG_LARGE)

    tb, nc, c0 = x_ref.shape
    h = x_ref[:, :, :].reshape(tb * nc, c0)
    h = jnp.maximum(
        jnp.dot(h, w1_ref[:, :], preferred_element_type=jnp.float32)
        + c1_ref[0, :][None, :],
        0.0,
    )
    h = jnp.maximum(
        jnp.dot(h, w2_ref[:, :], preferred_element_type=jnp.float32)
        + c2_ref[0, :][None, :],
        0.0,
    )
    y = (
        jnp.dot(h, w3_ref[:, :], preferred_element_type=jnp.float32)
        + c3_ref[0, :][None, :]
    )
    if relu_last:
        y = jnp.maximum(y, 0.0)
    cout = o_ref.shape[1]
    o_ref[:, :] = jnp.maximum(
        o_ref[:, :], jnp.max(y.reshape(tb, nc, cout), axis=1)
    )


@functools.partial(
    jax.jit,
    static_argnames=("relu_last", "tb", "nc", "interpret"),
)
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
    """max over points of a 3-layer pointwise MLP.

    Computes ``max_n(L3(relu(L2(relu(L1(x))))))`` with ``L_i(h) = h@W_i+c_i``
    and optional ReLU on L3, for x of shape (B, n, C0).

    Falls back to plain XLA when shapes don't tile (B % tb, n % nc).
    Returns (B, C_out) float32.
    """
    b, n, c0 = x.shape
    cout = w3.shape[1]
    if b % tb != 0 or n % nc != 0:
        h = jnp.maximum(jnp.einsum("bnc,cd->bnd", x, w1) + c1, 0.0)
        h = jnp.maximum(jnp.einsum("bnc,cd->bnd", h, w2) + c2, 0.0)
        y = jnp.einsum("bnc,cd->bnd", h, w3) + c3
        if relu_last:
            y = jnp.maximum(y, 0.0)
        return jnp.max(y, axis=1)

    grid = (b // tb, n // nc)
    mid1, mid2 = w1.shape[1], w2.shape[1]
    return pl.pallas_call(
        functools.partial(_chain_kernel, relu_last=relu_last),
        out_shape=jax.ShapeDtypeStruct((b, cout), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, nc, c0), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c0, mid1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mid1, mid2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mid2, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, cout), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w1, c1.reshape(1, -1), w2, c2.reshape(1, -1), w3,
      c3.reshape(1, -1))
