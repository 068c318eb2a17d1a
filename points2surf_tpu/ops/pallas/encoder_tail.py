"""Pallas kernel: fused PointNet encoder tail.

The hottest matmul of the model is the encoder's last shared-MLP layer —
``conv3: (B, n, 128) -> (B, n, 1024)`` followed by (inference-mode)
BatchNorm and a max-pool over the point axis (pointnet.py, reference
points_to_surf_model.py:203-212). Materializing the (B, n, 1024) activation
costs ~21 GB of HBM traffic at reconstruction batch sizes; this kernel
computes ``max_n(x @ W * a + c)`` tile-by-tile in VMEM so the wide
activation never leaves the chip's registers:

  grid = (B tiles, C_out tiles); each program streams the point axis in
  chunks, accumulating a running max on the MXU outputs.

Inference-mode BatchNorm folds into the matmul: with running stats
(m, v) and affine (g, b):  bn(y) = y * a + c,  a = g/sqrt(v+eps),
c = b - m*a — the caller passes the folded (W*a, c).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -1e30


def _tail_kernel(x_ref, w_ref, c_ref, o_ref, *, n_chunk: int):
    # x: (TB, n, Cin), w: (Cin, TC), c: (1, TC), o: (TB, TC)
    tb, n, cin = x_ref.shape
    tc = w_ref.shape[1]
    num_chunks = n // n_chunk

    def body(i, acc):
        xs = x_ref[:, pl.ds(i * n_chunk, n_chunk), :]  # (TB, nc, Cin)
        xs2 = xs.reshape(tb * n_chunk, cin)
        y = jnp.dot(xs2, w_ref[:, :], preferred_element_type=jnp.float32)
        y = y.reshape(tb, n_chunk, tc)
        return jnp.maximum(acc, jnp.max(y, axis=1))

    acc = jnp.full((tb, tc), NEG_LARGE, jnp.float32)
    acc = jax.lax.fori_loop(0, num_chunks, body, acc)
    o_ref[:, :] = acc + c_ref[0, :][None, :]


@functools.partial(
    jax.jit, static_argnames=("tb", "tc", "n_chunk", "interpret")
)
def mlp_maxpool(
    x: jax.Array,
    w: jax.Array,
    c: jax.Array,
    *,
    tb: int = 8,
    tc: int = 256,
    n_chunk: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """max over the point axis of (x @ w + c).

    Args:
      x: (B, n, Cin) float input; B % tb == 0 and n % n_chunk == 0 required
        (callers pad the point axis with a -inf-safe duplicate row or rely
        on n being a multiple — patch sizes are static per config).
      w: (Cin, Cout) folded weight; c: (Cout,) folded bias.

    Returns:
      (B, Cout) float32.
    """
    b, n, cin = x.shape
    cout = w.shape[1]
    if b % tb != 0 or cout % tc != 0 or n % n_chunk != 0:
        # fallback: plain XLA
        y = jnp.einsum("bnc,cd->bnd", x, w,
                       preferred_element_type=jnp.float32)
        return jnp.max(y, axis=1) + c[None, :]

    grid = (b // tb, cout // tc)
    return pl.pallas_call(
        functools.partial(_tail_kernel, n_chunk=n_chunk),
        out_shape=jax.ShapeDtypeStruct((b, cout), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n, cin), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, tc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w, c.reshape(1, -1))


def fold_batchnorm(w, scale, bias, mean, var, eps: float = 1e-5):
    """Fold inference BatchNorm into the preceding matmul.

    Returns (w_folded, c) with bn(x @ w) == x @ w_folded + c.
    """
    a = scale / jnp.sqrt(var + eps)
    return w * a[None, :], bias - mean * a
