"""PointNet-style encoders with spatial transformers, as flax modules.

Functional re-design of the reference's torch modules
(source/points_to_surf_model.py:12-234). The torch ``Conv1d(kernel=1)``
layers are pointwise linear maps over the point axis, which XLA fuses into
large batched matmuls on the MXU; points are laid out as ``(B, n, C)``
(channels-last, the TPU-friendly layout). BatchNorm statistics are computed
over all non-feature axes, matching torch ``BatchNorm1d`` on ``(B, C, n)``;
under pjit with the batch sharded over the mesh's data axis, the reductions
are global automatically — eliminating the reference's DataParallel/
BatchNorm pitfall (full_run.py:8-13).

Submodule names mirror the reference state_dict keys (conv1/bn1/fc1/...) so
that released ``.pth`` checkpoints map 1:1 onto our param pytree
(see models/import_torch.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from points2surf_tpu.ops import geometry

# checkpoint_name annotations mark cheap-to-save boundaries of the
# per-point chains (pool outputs, rotated inputs). They are no-ops in
# normal execution; wrapping the model apply in jax.checkpoint with
# jax.checkpoint_policies.save_only_these_names(*CHAIN_BOUNDARY_NAMES)
# turns them into a TARGETED remat that stores only these tensors and
# recomputes the HBM-heavy (B, n, 64/128) interiors in the backward
# (A/B via scripts/probe_train.py P2S_PROBE_REMAT=names).
from jax.ad_checkpoint import checkpoint_name

CHAIN_BOUNDARY_NAMES = ("p2s_rot_pts", "p2s_feat_rot", "p2s_pool")


def torch_linear_init(fan_in: int):
    """torch's default Linear/Conv init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    kaiming_uniform_(a=sqrt(5)) reduces to exactly this bound; using it keeps
    our training dynamics aligned with the reference's.
    """
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class PLinear(nn.Module):
    """Pointwise linear layer (torch Conv1d(k=1) / Linear equivalent)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_linear_init(fan_in),
            bias_init=torch_linear_init(fan_in),
            dtype=self.dtype,
            name="linear",
        )(x)


class BN(nn.Module):
    """BatchNorm matching torch BatchNorm1d defaults (eps 1e-5, mom 0.1)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="norm",
        )(x)


def _scale_pool(h, num_scales: int, sym_op: str = "max"):
    """Per-scale symmetric pooling: the point axis holds ``num_scales``
    equal-length segments (one per scale); pool each segment separately and
    concatenate scale-major along channels (reference model.py:48-56,
    219-230 multi-scale branches)."""
    b, n, c = h.shape
    h = h.reshape(b, num_scales, n // num_scales, c)
    h = jnp.max(h, axis=2) if sym_op == "max" else jnp.sum(h, axis=2)
    return h.reshape(b, num_scales * c)


# ---------------------------------------------------------------- fused tail
#
# Every encoder/STN trunk ends in `linear -> batchnorm -> (relu) -> pool
# over points`. Evaluated literally, the linear layer's (B, n, C_out)
# output (C_out = net_size_max = 1024) is by far the largest activation in
# the model — at batch 1000 the five trunk tails together hold ~16 GB of
# f32 — and the train step is HBM-traffic-bound on exactly these tensors
# (docs/PERFORMANCE.md round-2 decomposition). But BN's normalization is a
# per-channel AFFINE map once its statistics are known, and both relu and
# max-pool commute with monotone per-channel maps:
#
#   max_n relu(a_j * c[n,j] + b_j) = relu(a_j * (max_n c[n,j]) + b_j)  a>=0
#                                  = relu(a_j * (min_n c[n,j]) + b_j)  a<0
#   sum_n (a_j * c[n,j] + b_j)     = a_j * sum_n c[n,j] + n * b_j
#
# so the tail only ever needs per-(batch, channel) REDUCTIONS of the raw
# linear output c (max, min, sum, and sum-of-squares for the train-mode BN
# statistics) — all fusable into the matmul's epilogue — and the
# normalization/activation runs on the pooled (B, C) result.
#
# The modules below own parameters in the EXACT tree layout of the
# PLinear/BN pair they replace (convX/linear/{kernel,bias},
# bnX/norm/{scale,bias} + batch_stats bnX/norm/{mean,var}) so checkpoints
# and the torch importer are unaffected.

import os as _os

# module-level A/B switch (perf probes / equivalence tests):
#   0 = literal layer stack (materializes the (B, n, C_out) tail)
#   1 = fused reductions, autodiff backward (still scatters (B, n, C_out))
#   2 = fused reductions + hand-derived VJP (no (B, n, C_out) tensor in
#       either pass; the backward is gathers/scatters at the argmax rows
#       plus small gram-matrix matmuls — see _linear_pool_reductions_bwd)
_FUSED_TAIL = int(_os.environ.get("P2S_FUSED_TAIL", "2"))


class _TailDense(nn.Module):
    features: int
    fan_in: int

    @nn.compact
    def __call__(self):
        init = torch_linear_init(self.fan_in)
        kernel = self.param("kernel", init, (self.fan_in, self.features))
        bias = self.param("bias", init, (self.features,))
        return kernel, bias


class _TailDenseOwner(nn.Module):
    """Parameter-compatible stand-in for ``PLinear(name=...)``."""

    features: int
    fan_in: int

    @nn.compact
    def __call__(self):
        return _TailDense(self.features, self.fan_in, name="linear")()


class _TailBN(nn.Module):
    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        if batch_mean is not None and not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * batch_mean
            ra_var.value = m * ra_var.value + (1 - m) * batch_var
        return scale, bias, ra_mean.value, ra_var.value


class _TailBNOwner(nn.Module):
    """Parameter-compatible stand-in for ``BN(name=...)``."""

    features: int

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None):
        return _TailBN(self.features, name="norm")(batch_mean, batch_var)


def _pallas_tail_supported(x, kernel) -> bool:
    from points2surf_tpu.ops.pallas.train_tail import supported

    return supported(x, kernel)


def _lpr_compute(x, kernel, bias, dtype, need_minmax, need_stats,
                 with_argminmax=False):
    """Per-(batch, channel) reductions of ``c = x @ kernel + bias`` without
    keeping c: returns (cmax, cmin, csum, mean, var[, amax, amin])."""
    d = dtype or jnp.float32
    c = (
        jnp.einsum("bni,ij->bnj", x.astype(d), kernel.astype(d))
        + bias.astype(d)[None, None, :]
    )
    cmax = cmin = csum = mean = var = amax = amin = None
    if need_minmax:
        cmax = jnp.max(c, axis=1)
        cmin = jnp.min(c, axis=1)
        if with_argminmax:
            amax = jnp.argmax(c, axis=1).astype(jnp.int32)
            amin = jnp.argmin(c, axis=1).astype(jnp.int32)
    else:
        csum = jnp.sum(c.astype(jnp.float32), axis=1)
    if need_stats:
        n_tot = c.shape[0] * c.shape[1]
        c32 = c.astype(jnp.float32)
        mean = jnp.sum(c32, axis=(0, 1)) / n_tot
        var = jnp.sum(jnp.square(c32), axis=(0, 1)) / n_tot - jnp.square(
            mean
        )
    if with_argminmax:
        return cmax, cmin, csum, mean, var, amax, amin
    return cmax, cmin, csum, mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _linear_pool_reductions(x, kernel, bias, dtype, need_minmax, need_stats):
    return _lpr_compute(x, kernel, bias, dtype, need_minmax, need_stats)


def _lpr_fwd(x, kernel, bias, dtype, need_minmax, need_stats):
    d = dtype or jnp.float32
    # P2S_PALLAS_TAIL_INTERPRET=1 runs the kernel in interpret mode on
    # any backend — test-only escape hatch so the CPU suite can exercise
    # this exact glue (residual packing, stats assembly, sum-pool path)
    interpret = _os.environ.get("P2S_PALLAS_TAIL_INTERPRET", "") == "1"
    # multi-device meshes need the custom_partitioning wrapper (pallas
    # has no SPMD rule). Default-ON since round 5: the rule is validated
    # per-shard on virtual meshes (dryrun_multichip, XLA A/B 1.3e-06)
    # and the real kernel is validated inside a real-chip mesh context
    # (scripts/probe_sharded_tail.py, bf16-grade A/B vs fallback);
    # P2S_PALLAS_TAIL_SHARDED=0 restores the XLA fallback on meshes.
    multi = jax.device_count() > 1
    sharded_ok = _os.environ.get("P2S_PALLAS_TAIL_SHARDED", "1") == "1"
    if (
        d == jnp.float32
        and _os.environ.get("P2S_PALLAS_TAIL", "1") == "1"
        and (not multi or sharded_ok)
        and (interpret or _pallas_tail_supported(x, kernel))
        and x.ndim == 3
        and x.shape[0] % 8 == 0
    ):
        # one-pass Pallas reductions: the (B, n, C) dot output never
        # touches HBM (XLA materializes it for multi-consumer reductions
        # — ~27 GB/step across the five flagship tails). Single-device
        # gate: pallas_call has no partitioning rule, so sharded meshes
        # keep the XLA path.
        from points2surf_tpu.ops.pallas.train_tail import (
            pooled_tail_reductions,
            pooled_tail_reductions_sharded,
        )

        fn = pooled_tail_reductions_sharded if multi else (
            pooled_tail_reductions
        )
        kmax, amax, kmin, amin, rsum, rsq = fn(
            x.astype(jnp.float32), kernel.astype(jnp.float32),
            bias.astype(jnp.float32), interpret=interpret,
        )
        n_tot = x.shape[0] * x.shape[1]
        cmax = cmin = csum = mean = var = None
        if need_minmax:
            cmax, cmin = kmax, kmin
        else:
            csum = rsum
        if need_stats:
            mean = jnp.sum(rsum, axis=0) / n_tot
            var = jnp.sum(rsq, axis=0) / n_tot - jnp.square(mean)
        return (cmax, cmin, csum, mean, var), (
            x, kernel, bias, amax, amin, mean
        )
    cmax, cmin, csum, mean, var, amax, amin = _lpr_compute(
        x, kernel, bias, dtype, need_minmax, need_stats, with_argminmax=True
    )
    return (cmax, cmin, csum, mean, var), (x, kernel, bias, amax, amin, mean)


def _lpr_bwd(dtype, need_minmax, need_stats, res, cot):
    """Hand-derived VJP that never materializes the (B, n, C_out) tensor.

    With c = x @ W + b and outputs (max_n c, min_n c | sum_n c, mean(c),
    var(c)), the cotangent into c decomposes as

      dL/dc[b,n,j] = gmax[b,j]*1[n=amax] + gmin[b,j]*1[n=amin]   (max pool)
                     (or gsum[b,j] broadcast over n)             (sum pool)
                   + alpha_j + kappa_j * c[b,n,j]                (BN stats)

    with alpha = (gmean - 2*mean*gvar)/N and kappa = 2*gvar/N. Pushing
    that through the linear map analytically:

      grad_x = scatter(amax/amin rows of gm * W^T)
             + x @ (W diag(kappa) W^T) + const_vec
      grad_W = gathered-x einsums + xsum (x) alpha
             + kappa * (Gram(x) @ W + xsum (x) b)
      grad_b = col-sums + N*alpha + kappa*N*mean

    i.e. two (B, C, I) gather/scatter passes and a pair of (I, I) gram
    matmuls — O(B*C*I + B*n*I) traffic instead of O(B*n*C)."""
    x, kernel, bias, amax, amin, mean = res
    gmax, gmin, gsum, gmean, gvar = cot

    b_sz, n_pts, dim_in = x.shape
    n_tot = b_sz * n_pts
    x32 = x.astype(jnp.float32)
    k32 = kernel.astype(jnp.float32)
    b32 = bias.astype(jnp.float32)
    c_out = kernel.shape[1]
    f32 = jnp.float32

    def _z(g, shape):
        return jnp.zeros(shape, f32) if g is None else g.astype(f32)

    if need_stats:
        gmean = _z(gmean, (c_out,))
        gvar = _z(gvar, (c_out,))
        alpha = (gmean - 2.0 * mean * gvar) / n_tot
        kappa = 2.0 * gvar / n_tot
    else:
        alpha = jnp.zeros((c_out,), f32)
        kappa = jnp.zeros((c_out,), f32)

    xsum = jnp.sum(x32, axis=(0, 1))  # (I,)

    # ---- grad_x ----
    # dense rank-structure terms: alpha/kappa from the BN statistics
    k_kappa = k32 * kappa[None, :]  # (I, C)
    gram_k = k_kappa @ k32.T  # (I, I)
    vec = alpha @ k32.T + (b32 * kappa) @ k32.T  # (I,)
    grad_x = jnp.einsum("bni,ik->bnk", x32, gram_k) + vec[None, None, :]

    # ---- grad_W / grad_b shared pieces ----
    gram_x = jnp.einsum("bni,bnk->ik", x32, x32)  # (I, I)
    grad_w = (
        xsum[:, None] * alpha[None, :]
        + (gram_x @ k32 + xsum[:, None] * b32[None, :]) * kappa[None, :]
    )
    grad_b = n_tot * alpha + kappa * (n_tot * mean if need_stats else 0.0)

    if need_minmax:
        gmax = _z(gmax, (b_sz, c_out))
        gmin = _z(gmin, (b_sz, c_out))
        # implicit one-hot: (iota == arg) * g is an elementwise producer
        # XLA fuses into the dot operands — no HBM materialization and,
        # critically, NO scatter/gather (TPU scatter lowering serializes;
        # an .at[].add formulation measured 3x SLOWER than baseline)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n_pts, 1), 1)
        a_mask = (
            jnp.where(iota_n == amax[:, None, :], gmax[:, None, :], 0.0)
            + jnp.where(iota_n == amin[:, None, :], gmin[:, None, :], 0.0)
        )
        grad_x = grad_x + jnp.einsum("bnj,ij->bni", a_mask, k32)
        if _os.environ.get("P2S_BWD_GATHER_W", "") == "1":
            # A/B variant: a_mask feeds TWO einsums (grad_x above and
            # grad_w), which may force XLA to materialize the (B, n, C)
            # mask; this form computes grad_w from gathered argmax/argmin
            # rows instead — (B, C, I) gathers (~0.5 GB at flagship
            # shapes) replacing a (B, n, C) contraction operand
            xg_max = jnp.take_along_axis(
                x32[:, :, None, :],
                amax[:, None, :, None].astype(jnp.int32), axis=1,
            )[:, 0]  # (B, C, I)
            xg_min = jnp.take_along_axis(
                x32[:, :, None, :],
                amin[:, None, :, None].astype(jnp.int32), axis=1,
            )[:, 0]
            grad_w = grad_w + (
                jnp.einsum("bji,bj->ij", xg_max, gmax)
                + jnp.einsum("bji,bj->ij", xg_min, gmin)
            )
        else:
            grad_w = grad_w + jnp.einsum("bni,bnj->ij", x32, a_mask)
        grad_b = grad_b + jnp.sum(gmax, axis=0) + jnp.sum(gmin, axis=0)
    else:
        gsum = _z(gsum, (b_sz, c_out))
        grad_x = grad_x + jnp.einsum("bj,ij->bi", gsum, k32)[:, None, :]
        grad_w = grad_w + jnp.einsum("bi,bj->ij", jnp.sum(x32, axis=1), gsum)
        grad_b = grad_b + n_pts * jnp.sum(gsum, axis=0)

    return (
        grad_x.astype(x.dtype),
        grad_w.astype(kernel.dtype),
        grad_b.astype(bias.dtype),
    )


_linear_pool_reductions.defvjp(_lpr_fwd, _lpr_bwd)


def _pooled_tail(x, act_relu, sym_op, dtype, train, conv_mod, bn_mod):
    """Apply the fused linear->BN->(relu)->pool tail (single-scale only).

    ``conv_mod``/``bn_mod`` are the parameter owners instantiated by the
    CALLER (so the variables live at the caller's scope level)."""
    kernel, bias = conv_mod()
    need_minmax = sym_op == "max"
    d = dtype or jnp.float32

    if not train:
        # EVAL: the BN statistics are the (known) running averages, so the
        # affine can be applied elementwise BEFORE the pool, leaving ONE
        # reduction consumer on the matmul — XLA then fuses the whole
        # epilogue into the dot and never materializes (B, n, C). The
        # train-mode max+min formulation has TWO reduction consumers,
        # which XLA materializes — a compile-time OOM at eval batch sizes
        # (f32[4096,1300,1024] = 21.8 GB observed).
        scale, bn_bias, mean, var = bn_mod()
        inv = (scale.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-5))
        shift = bn_bias.astype(jnp.float32) - mean * inv
        if d in (None, jnp.float32) and (
            _os.environ.get("P2S_EVAL_TAIL_BF16", "0") == "1"
        ):
            # P2S_EVAL_TAIL_BF16: the five trunk-tail matmuls hold ~90%
            # of the forward FLOPs (docs/PERFORMANCE.md round 5); run
            # JUST these dots with bf16 operands + f32 MXU accumulation
            # (the native TPU mode) while everything geometric — patch
            # normalization, rotations, distances — stays f32. Read once
            # at trace time like the other eval levers; quality-gated at
            # reconstruction grade before any default change.
            c = jnp.einsum(
                "bni,ij->bnj",
                x.astype(jnp.bfloat16),
                kernel.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) + bias.astype(jnp.float32)[None, None, :]
        else:
            c = (
                jnp.einsum("bni,ij->bnj", x.astype(d), kernel.astype(d))
                + bias.astype(d)[None, None, :]
            )
        y = c.astype(jnp.float32) * inv[None, None, :] + shift[None, None, :]
        if act_relu:
            y = nn.relu(y)
        pooled = (
            jnp.max(y, axis=1) if need_minmax else jnp.sum(y, axis=1)
        )
        return pooled.astype(d)

    reduce_fn = _linear_pool_reductions if _FUSED_TAIL >= 2 else _lpr_compute
    cmax, cmin, csum, bmean, bvar = reduce_fn(
        x, kernel, bias, dtype, need_minmax, True
    )
    scale, bn_bias, _, _ = bn_mod(bmean, bvar)
    mean, var = bmean, bvar
    inv = scale.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-5)
    shift = bn_bias.astype(jnp.float32) - mean * inv
    if need_minmax:
        pooled = (
            jnp.where(
                inv[None, :] >= 0,
                cmax.astype(jnp.float32),
                cmin.astype(jnp.float32),
            )
            * inv[None, :]
            + shift[None, :]
        )
    else:
        n_pts = x.shape[1]
        pooled = csum * inv[None, :] + n_pts * shift[None, :]
    if act_relu:
        pooled = nn.relu(pooled)
    return pooled.astype(d)


# ------------------------------------------------------- covariance-form BN
#
# The INTERIOR per-point layers (`linear -> batchnorm(train) -> relu` over
# (B, n, C)) are the other HBM-traffic hotspot: evaluated literally, XLA
# writes the (B, n, C) linear output, re-reads it for the BN statistics,
# re-reads it again for normalize+relu, and writes the result — five
# tensor passes per layer (plus the mirrored traffic in the backward).
# But the batch statistics of ``y = x @ W + b`` are an analytic function
# of much smaller moments of x:
#
#   mean(y)_j = mean(x) @ W[:, j] + b_j
#   var(y)_j  = W[:, j]^T Cov(x) W[:, j]
#
# with Cov(x) the (Cin, Cin) covariance of the point rows — one small
# Gram matmul (MXU, one streaming read of x). The whole layer then
# collapses to a SINGLE matmul with effective weights
#
#   z = relu(x @ (W * g/sigma) + (beta + (b - mean_y) * g/sigma))
#
# i.e. read x twice + write z, instead of five passes over the wider y.
# The function of (x, W, b, gamma, beta) is mathematically identical to
# the literal stack, so autodiff gives the exact same gradients (the
# statistics' gradient paths flow through the Gram/mean terms as small
# matmuls instead of BN's wide reductions). The Gram/mean contractions
# use Precision.HIGHEST so the variance survives the E[x^2] - E[x]^2
# cancellation (same formulation flax's BatchNorm itself uses).
#
# A/B switch: 0 = literal PLinear+BN stack, 1 = covariance form for
# train-mode f32 per-point layers (eval and bf16 keep the literal path —
# eval BN is a known affine XLA already fuses into the matmul epilogue).
_COVBN = int(_os.environ.get("P2S_COVBN", "1"))


def _conv_bn_relu(x, train, features, dtype, conv_name, bn_name):
    """Pointwise linear -> BatchNorm -> ReLU, parameter-compatible with the
    ``nn.relu(BN(name=bn)(PLinear(features, name=conv)(x), train))`` stack
    (reference model.py per-point conv+bn pairs). Must be called from a
    ``@nn.compact`` scope; owns params under ``conv_name``/``bn_name``."""
    d = dtype
    if not (_COVBN and train and x.ndim == 3 and d in (None, jnp.float32)):
        return nn.relu(
            BN(d, name=bn_name)(PLinear(features, d, name=conv_name)(x),
                                train)
        )
    kernel, bias = _TailDenseOwner(features, x.shape[-1], name=conv_name)()
    hi = jax.lax.Precision.HIGHEST
    x32 = x.astype(jnp.float32)
    k32 = kernel.astype(jnp.float32)
    b32 = bias.astype(jnp.float32)
    n_tot = x.shape[0] * x.shape[1]
    xsum = jnp.sum(x32, axis=(0, 1))
    xm = xsum / n_tot
    gram = jnp.einsum("bni,bnk->ik", x32, x32, precision=hi) / n_tot
    cov = gram - xm[:, None] * xm[None, :]
    mean_y = xm @ k32 + b32
    var_y = jnp.maximum(
        jnp.einsum("ic,ic->c", k32, cov @ k32, precision=hi), 0.0
    )
    scale, bn_bias, _, _ = _TailBNOwner(features, name=bn_name)(
        mean_y, var_y
    )
    inv = scale.astype(jnp.float32) * jax.lax.rsqrt(var_y + 1e-5)
    w_eff = k32 * inv[None, :]
    b_eff = bn_bias.astype(jnp.float32) + (b32 - mean_y) * inv
    z = jnp.einsum("bni,ij->bnj", x32, w_eff) + b_eff[None, None, :]
    return nn.relu(z)


# ------------------------------------------------------- fused eval chain
#
# At EVAL, every trunk is `conv1 -> bn -> relu -> conv2 -> bn -> relu ->
# conv3 -> bn -> (relu) -> pool` with all BN affines KNOWN, so the whole
# chain is a pure per-point MLP + reduction. The Pallas chain kernel
# (ops/pallas/chain_kernel.py) fuses it into one VMEM pass. Measured
# NEGATIVE result — the kernel is ~1.85x SLOWER than XLA's literal
# chains at every viable tiling (docs/PERFORMANCE.md round 5), so it
# stays default-OFF; the wiring is kept as tested machinery and the
# evidence that the eval forward is architecture-bound
# (P2S_EVAL_CHAIN=1 enables; _INTERPRET=1 is the CPU test escape hatch).


def _eval_chain_ok(x, dtype, train: bool, num_scales: int) -> bool:
    """Trace-time gate for the fused eval conv-chain kernel."""
    if train or num_scales != 1 or x.ndim != 3:
        return False
    if (dtype or jnp.float32) != jnp.float32:
        return False
    if _os.environ.get("P2S_EVAL_CHAIN", "0") != "1":
        return False
    from points2surf_tpu.ops.pallas import chain_kernel as _ck

    interpret = _os.environ.get("P2S_EVAL_CHAIN_INTERPRET", "") == "1"
    if not (interpret or _ck.supported(x)):
        return False
    if jax.device_count() > 1 and (
        _os.environ.get("P2S_EVAL_CHAIN_SHARDED", "1") != "1"
    ):
        return False
    return True


def _eval_chain_call(x, layers, sym_op: str):
    from points2surf_tpu.ops.pallas import chain_kernel as _ck

    interpret = _os.environ.get("P2S_EVAL_CHAIN_INTERPRET", "") == "1"
    fn = _ck.chain_pool_sharded if jax.device_count() > 1 else _ck.chain_pool
    return fn(x, tuple(layers), sym_op=sym_op, interpret=interpret)


def _eval_chain_layer(conv_name, bn_name, features, fan_in):
    """(W, a, c) triple for one conv+bn eval layer, reading the params
    through the parameter-compatible owner modules (same tree layout as
    the PLinear/BN stack — torch import and checkpoints unaffected).
    Must be called from a ``@nn.compact`` scope, like ``_conv_bn_relu``."""
    from points2surf_tpu.ops.pallas.chain_kernel import fold_conv_bn

    kernel, cbias = _TailDenseOwner(features, fan_in, name=conv_name)()
    scale, bbias, mean, var = _TailBNOwner(features, name=bn_name)()
    a, c = fold_conv_bn(kernel, cbias, scale, bbias, mean, var)
    return kernel, a, c


class _STNTrunk(nn.Module):
    """Shared conv trunk + FC head of STN/QSTN (model.py:41-64, 100-122)."""

    net_size_max: int = 1024
    out_features: int = 9
    dtype: Optional[jnp.dtype] = None
    num_scales: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        if _eval_chain_ok(x, d, train, self.num_scales):
            # fused eval chain: conv1..conv3 + bn affines + max pool in
            # one VMEM pass; the post-bn3 relu commutes with the max
            layers = (
                _eval_chain_layer("conv1", "bn1", 64, x.shape[-1]),
                _eval_chain_layer("conv2", "bn2", 128, 64),
                _eval_chain_layer("conv3", "bn3", self.net_size_max, 128),
            )
            h = nn.relu(_eval_chain_call(x, layers, "max")).astype(
                d or jnp.float32
            )
            return self._fc_head(h, train)
        h = _conv_bn_relu(x, train, 64, d, "conv1", "bn1")
        h = _conv_bn_relu(h, train, 128, d, "conv2", "bn2")
        # symmetric max over points; per scale segment when multi-scale
        # (the reference STN pools with max regardless of sym_op,
        # model.py:25,48-55). Single-scale uses the fused tail (affine
        # BN + relu commute with the max — see module docs above).
        if _FUSED_TAIL and self.num_scales == 1:
            h = _pooled_tail(
                h, act_relu=True, sym_op="max", dtype=d, train=train,
                conv_mod=_TailDenseOwner(
                    self.net_size_max, h.shape[-1], name="conv3"
                ),
                bn_mod=_TailBNOwner(self.net_size_max, name="bn3"),
            )
            h = checkpoint_name(h, "p2s_pool")
        else:
            h = nn.relu(
                BN(d, name="bn3")(
                    PLinear(self.net_size_max, d, name="conv3")(h), train
                )
            )
            h = _scale_pool(h, self.num_scales)
        return self._fc_head(h, train)

    def _fc_head(self, h, train: bool):
        d = self.dtype
        if self.num_scales > 1:
            h = nn.relu(
                BN(d, name="bn0")(
                    PLinear(self.net_size_max, d, name="fc0")(h), train
                )
            )
        h = nn.relu(
            BN(d, name="bn4")(
                PLinear(self.net_size_max // 2, d, name="fc1")(h), train
            )
        )
        h = nn.relu(
            BN(d, name="bn5")(
                PLinear(self.net_size_max // 4, d, name="fc2")(h), train
            )
        )
        return PLinear(self.out_features, d, name="fc3")(h)


class STN(nn.Module):
    """Feature spatial transformer: outputs a (dim x dim) matrix + identity.

    Reference source/points_to_surf_model.py:12-69.
    """

    net_size_max: int = 1024
    dim: int = 64
    dtype: Optional[jnp.dtype] = None
    num_scales: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _STNTrunk(
            self.net_size_max, self.dim * self.dim, self.dtype,
            self.num_scales, name="trunk"
        )(x, train)
        iden = jnp.eye(self.dim, dtype=h.dtype).reshape(-1)
        return (h + iden).reshape(x.shape[0], self.dim, self.dim)


class QSTN(nn.Module):
    """Quaternion point transformer: regresses a rotation (model.py:72-131).

    The network outputs a 4-vector added to the identity quaternion
    ``[1, 0, 0, 0]`` (so zero output = identity rotation), converted to a
    rotation matrix via the Hamilton-product formula.
    """

    net_size_max: int = 1024
    dtype: Optional[jnp.dtype] = None
    num_scales: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _STNTrunk(self.net_size_max, 4, self.dtype, self.num_scales,
                      name="trunk")(x, train)
        quat = h + jnp.asarray([1.0, 0.0, 0.0, 0.0], h.dtype)
        return geometry.quat_to_rotmat(quat), quat


class PointNetFeat(nn.Module):
    """Shared-MLP point encoder (reference model.py:134-234).

    Input ``(B, n, 3)`` points, output ``(B, output_size)`` codeword via:
    optional QSTN rotation -> MLP(64, 64) -> optional 64-d feature STN ->
    MLP(64, 128, output_size) -> symmetric max (or sum) pool.
    """

    net_size_max: int = 1024
    output_size: int = 1024
    use_point_stn: bool = True
    use_feat_stn: bool = True
    sym_op: str = "max"
    dtype: Optional[jnp.dtype] = None
    num_scales: int = 1  # multi-scale branch (reference model.py:166-230):
    # the point axis carries num_scales equal segments; codeword becomes
    # (B, output_size * num_scales**2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        trans = None
        trans_quat = None
        if self.use_point_stn:
            trans, trans_quat = QSTN(
                self.net_size_max, d, self.num_scales, name="stn1"
            )(x, train)
            x = checkpoint_name(
                geometry.transform_points(x, trans), "p2s_rot_pts"
            )

        h = _conv_bn_relu(x, train, 64, d, "conv0a", "bn0a")
        h = _conv_bn_relu(h, train, 64, d, "conv0b", "bn0b")

        trans2 = None
        if self.use_feat_stn:
            trans2 = STN(self.net_size_max, 64, d, self.num_scales,
                         name="stn2")(h, train)
            h = checkpoint_name(
                jnp.einsum("bij,bnj->bni", trans2, h), "p2s_feat_rot"
            )

        if self.sym_op not in ("max", "sum"):
            raise ValueError(f"Unsupported symmetric operation: {self.sym_op}")

        if _eval_chain_ok(h, d, train, self.num_scales):
            # fused eval chain: conv1 -> conv2 -> conv3 with bn affines +
            # sym pool in one VMEM pass (no relu after bn3 in the
            # single-scale reference path, model.py:209-230)
            layers = (
                _eval_chain_layer("conv1", "bn1", 64, h.shape[-1]),
                _eval_chain_layer("conv2", "bn2", 128, 64),
                _eval_chain_layer("conv3", "bn3", self.output_size, 128),
            )
            h = _eval_chain_call(h, layers, self.sym_op).astype(
                d or jnp.float32
            )
            return h, trans, trans_quat, trans2

        h = _conv_bn_relu(h, train, 64, d, "conv1", "bn1")
        h = _conv_bn_relu(h, train, 128, d, "conv2", "bn2")

        if _FUSED_TAIL and self.num_scales == 1:
            # fused conv3 -> bn3 -> sym pool (no relu before the pool in
            # the single-scale reference path, model.py:209-230)
            h = checkpoint_name(
                _pooled_tail(
                    h, act_relu=False, sym_op=self.sym_op, dtype=d,
                    train=train,
                    conv_mod=_TailDenseOwner(
                        self.output_size, h.shape[-1], name="conv3"
                    ),
                    bn_mod=_TailBNOwner(self.output_size, name="bn3"),
                ),
                "p2s_pool",
            )
        else:
            h = BN(d, name="bn3")(
                PLinear(self.output_size, d, name="conv3")(h), train
            )
            if self.num_scales > 1:
                # (output_size -> output_size*num_scales) expansion, then
                # pool each scale segment (reference model.py:207-230)
                h = BN(d, name="bn4")(
                    PLinear(self.output_size * self.num_scales, d,
                            name="conv4")(nn.relu(h)), train
                )
            h = _scale_pool(h, self.num_scales, self.sym_op)

        return h, trans, trans_quat, trans2
