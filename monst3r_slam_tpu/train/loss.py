"""Training objective: confidence-weighted two-view pointmap regression.

The reference repo ships inference-only; this implements the DUSt3R/MASt3R
training objective (conf-aware regression, Wang et al. CVPR'24: per-pixel
L = C * ||X - X_gt|| - alpha * log C, with per-view depth normalization) so
the framework supports fine-tuning the pointmap models on TPU meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_pointmap(X: jax.Array, valid: jax.Array) -> jax.Array:
    """Scale-normalize by the mean distance of valid points (per batch el)."""
    d = jnp.linalg.norm(X, axis=-1)
    denom = jnp.sum(valid, axis=(1, 2)) + 1e-8
    mean_d = jnp.sum(d * valid, axis=(1, 2)) / denom
    return X / jnp.maximum(mean_d, 1e-8)[:, None, None, None]


def conf_regression_loss(
    pred_X: jax.Array,  # (B, H, W, 3)
    pred_C: jax.Array,  # (B, H, W) confidence (>= vmin)
    gt_X: jax.Array,
    valid: jax.Array,  # (B, H, W) bool/float
    alpha: float = 0.2,
    normalize: bool = True,
) -> jax.Array:
    valid = valid.astype(jnp.float32)
    if normalize:
        pred_X = normalize_pointmap(pred_X, valid)
        gt_X = normalize_pointmap(gt_X, valid)
    err = jnp.linalg.norm(pred_X - gt_X, axis=-1)
    # conf-aware: C*err - alpha*log(C); C is strictly positive by construction
    logC = jnp.log(jnp.maximum(pred_C, 1e-8))
    per_pix = pred_C * err - alpha * logC
    return jnp.sum(per_pix * valid) / (jnp.sum(valid) + 1e-8)


def two_view_loss(out, batch, alpha: float = 0.2) -> jax.Array:
    """`out` is a models.mast3r.PairOutput; batch carries gt_X1/gt_X2/valid."""
    l1 = conf_regression_loss(out.X1, out.C1, batch["gt_X1"], batch["valid1"], alpha)
    l2 = conf_regression_loss(out.X2, out.C2, batch["gt_X2"], batch["valid2"], alpha)
    return l1 + l2
