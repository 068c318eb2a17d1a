"""SDF heads: losses and prediction post-processing.

JAX equivalents of the reference source/sdf_nn.py. The tanh squashing
focuses the regressor's resolution on short distances; the default model
predicts [distance magnitude, sign logit], the regression variant predicts a
single signed distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def post_process_distance(pred: jax.Array) -> jax.Array:
    """tanh(pred)^2 * sign(pred) (reference sdf_nn.py:6-8)."""
    return jnp.tanh(pred) ** 2 * jnp.sign(pred)


def post_process_magnitude(pred: jax.Array) -> jax.Array:
    """tanh(pred)^2 (reference sdf_nn.py:11-13)."""
    return jnp.tanh(pred) ** 2


def post_process_sign(pred: jax.Array) -> jax.Array:
    """Sign logits -> {-1.0, +1.0}; >= 0 maps to +1 (reference sdf_nn.py:16-21)."""
    return jnp.where(pred >= 0.0, 1.0, -1.0).astype(jnp.float32)


def calc_loss_distance(pred: jax.Array, target: jax.Array) -> jax.Array:
    """MSE on tanh-squashed signed distances (reference sdf_nn.py:24-27)."""
    return jnp.mean((jnp.tanh(pred) - jnp.tanh(target)) ** 2)


def calc_loss_magnitude(pred: jax.Array, target: jax.Array) -> jax.Array:
    """MSE on tanh-squashed absolute distances (reference sdf_nn.py:30-34)."""
    return jnp.mean((jnp.tanh(jnp.abs(pred)) - jnp.tanh(jnp.abs(target))) ** 2)


def calc_loss_sign(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean binary cross-entropy with logits (reference sdf_nn.py:37-40).

    Numerically stable form: max(x,0) - x*z + log(1 + exp(-|x|)).
    """
    return jnp.mean(
        jnp.maximum(pred, 0.0)
        - pred * target
        + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


def compute_loss(
    pred: jax.Array,
    batch: dict,
    outputs: tuple,
    output_loss_weights: dict,
    fixed_radius: bool,
):
    """Combine per-output losses (reference points_to_surf_train.py:537-563).

    In adaptive-radius (kNN) mode, targets are divided by the per-patch
    radius so the network regresses patch-space distances (:544-546).

    Returns a list of weighted scalar losses (same structure as reference).
    """
    losses = []
    if "imp_surf" in outputs:
        target = batch["imp_surf_ms"].reshape(-1)
        if not fixed_radius:
            target = target / batch["patch_radius_ms"].reshape(-1)
        losses.append(
            calc_loss_distance(pred.reshape(-1), target)
            * output_loss_weights["imp_surf"]
        )
    if "imp_surf_magnitude" in outputs and "imp_surf_sign" in outputs:
        target = batch["imp_surf_magnitude_ms"].reshape(-1)
        if not fixed_radius:
            target = target / batch["patch_radius_ms"].reshape(-1)
        losses.append(
            calc_loss_magnitude(pred[:, 0], target)
            * output_loss_weights["imp_surf_magnitude"]
        )
        losses.append(
            calc_loss_sign(pred[:, 1], batch["imp_surf_dist_sign_ms"].reshape(-1))
            * output_loss_weights["imp_surf_sign"]
        )
    return losses


def calc_metrics(outputs: tuple, pred: jax.Array, batch: dict) -> dict:
    """Training metrics (reference points_to_surf_train.py:566-595).

    Returns dict with abs_dist_rms, accuracy, precision, recall, f1_score as
    jnp scalars (NaN where a denominator is empty, matching the reference's
    NaN-on-empty semantics in evaluation.py:8-36).
    """
    if "imp_surf_magnitude" in outputs and "imp_surf_sign" in outputs:
        mag_pred = post_process_magnitude(pred[:, 0])
        gt_mag = jnp.abs(batch["imp_surf_magnitude_ms"].reshape(-1))
        rms = jnp.sqrt(jnp.mean((jnp.abs(mag_pred) - gt_mag) ** 2))
        sign_pred = post_process_sign(pred[:, 1])
        gt_sign = batch["imp_surf_dist_sign_ms"].reshape(-1)
    elif "imp_surf" in outputs:
        mag_pred = post_process_magnitude(pred.reshape(-1))
        gt_mag = jnp.abs(batch["imp_surf_ms"].reshape(-1))
        rms = jnp.sqrt(jnp.mean((jnp.abs(mag_pred) - gt_mag) ** 2))
        sign_pred = jnp.where(pred.reshape(-1) >= 0.0, 1.0, -1.0)
        gt_sign = batch["imp_surf_dist_sign_ms"].reshape(-1)
    else:
        return {}

    p = sign_pred > 0.0
    g = gt_sign > 0.0
    tp = jnp.sum(p & g).astype(jnp.float32)
    fp = jnp.sum(p & ~g).astype(jnp.float32)
    fn = jnp.sum(~p & g).astype(jnp.float32)
    tn = jnp.sum(~p & ~g).astype(jnp.float32)
    total = tp + fp + fn + tn
    accuracy = (tp + tn) / total
    precision = tp / (tp + fp)  # NaN when no positives predicted
    recall = tp / (tp + fn)
    f1 = 2.0 * precision * recall / (precision + recall)
    return {
        "abs_dist_rms": rms,
        "accuracy": accuracy,
        "precision": precision,
        "recall": recall,
        "f1_score": f1,
    }
