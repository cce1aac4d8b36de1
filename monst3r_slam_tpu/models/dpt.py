"""DPT feature-pyramid head in NHWC JAX.

Functional port of the reference's DPTOutputAdapter_fix
(`dust3r/heads/dpt_head.py:20-66`, `croco/models/dpt_block.py:20-410`):
four hook activations -> per-level reassembly (act_postprocess) -> 3x3
projection (layer_rn) -> refinenet fusion pyramid -> regression head.

TPU notes: convs run NHWC on the MXU; the stride-matching transposed convs are
expressed as matmul + pixel-shuffle (exact equivalence since kernel == stride);
align_corners bilinear x2 upsampling is expressed as two small interpolation-
matrix matmuls rather than gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.models.config import ModelConfig


def conv2d(p, x: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_transpose_exact(p, x: jax.Array, factor: int) -> jax.Array:
    """ConvTranspose2d with kernel == stride == factor (no overlap).

    p['w'] has shape (factor, factor, in_ch, out_ch). Exactly equivalent to a
    per-pixel linear into (factor*factor*out_ch) followed by pixel shuffle.
    """
    b, h, w, ci = x.shape
    f = factor
    wmat = p["w"].astype(x.dtype).transpose(2, 0, 1, 3).reshape(ci, f * f * p["w"].shape[-1])
    y = x @ wmat  # (b, h, w, f*f*co)
    co = p["w"].shape[-1]
    y = y.reshape(b, h, w, f, f, co).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, h * f, w * f, co)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _interp_matrix(n_out: int, n_in: int, dtype) -> jax.Array:
    """Row-stochastic align_corners=True bilinear interpolation matrix."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 2)
    frac = src - lo.astype(jnp.float32)
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    m = m.at[rows, lo].set(1.0 - frac)
    m = m.at[rows, lo + 1].add(frac)
    return m.astype(dtype)


def resize_bilinear_ac(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """NHWC bilinear resize with align_corners=True via matmuls."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    mh = _interp_matrix(out_h, h, x.dtype)
    mw = _interp_matrix(out_w, w, x.dtype)
    y = jnp.einsum("Hh,bhwc->bHwc", mh, x)
    return jnp.einsum("Ww,bHwc->bHWc", mw, y)


def residual_conv_unit(p, x: jax.Array) -> jax.Array:
    """ReLU-conv-ReLU-conv + skip (`dpt_block.py:80-140`, no batchnorm)."""
    out = jax.nn.relu(x)
    out = conv2d(p["conv1"], out, padding=1)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, padding=1)
    return out + x


def fusion_block(p, x: jax.Array, skip: jax.Array | None) -> jax.Array:
    """FeatureFusionBlock_custom (`dpt_block.py:142-212`), width_ratio=1."""
    out = x
    if skip is not None:
        out = out + residual_conv_unit(p["res1"], skip)
    out = residual_conv_unit(p["res2"], out)
    b, h, w, c = out.shape
    out = resize_bilinear_ac(out, 2 * h, 2 * w)
    return conv2d(p["out_conv"], out)


def dpt_forward(p, cfg: ModelConfig, hook_feats, n_h: int, n_w: int) -> jax.Array:
    """hook_feats: 4 token tensors (B, N, dim) at cfg.hooks -> (B, H, W, 4).

    Mirrors DPTOutputAdapter_fix.forward (`dpt_head.py:34-66`).
    """
    feats = []
    for idx, tokens in enumerate(hook_feats):
        b, n, d = tokens.shape
        x = tokens.reshape(b, n_h, n_w, d)
        act = p["act"][idx]
        if idx == 0:  # 1x1 conv + x4 transposed conv
            x = conv2d(act["conv"], x)
            x = conv_transpose_exact(act["up"], x, 4)
        elif idx == 1:  # 1x1 conv + x2 transposed conv
            x = conv2d(act["conv"], x)
            x = conv_transpose_exact(act["up"], x, 2)
        elif idx == 2:  # 1x1 conv only
            x = conv2d(act["conv"], x)
        else:  # 1x1 conv + 3x3 stride-2 conv (downsample)
            x = conv2d(act["conv"], x)
            x = conv2d(act["down"], x, stride=2, padding=1)
        x = conv2d(p["layer_rn"][idx], x, padding=1)
        feats.append(x)

    path4 = fusion_block(p["refine4"], feats[3], None)
    path4 = path4[:, : feats[2].shape[1], : feats[2].shape[2], :]
    path3 = fusion_block(p["refine3"], path4, feats[2])
    path2 = fusion_block(p["refine2"], path3, feats[1])
    path1 = fusion_block(p["refine1"], path2, feats[0])

    # Regression head (`dpt_block.py:317-324`)
    h = conv2d(p["head"]["conv1"], path1, padding=1)
    b, hh, ww, c = h.shape
    h = resize_bilinear_ac(h, 2 * hh, 2 * ww)
    h = conv2d(p["head"]["conv2"], h, padding=1)
    h = jax.nn.relu(h)
    return conv2d(p["head"]["conv3"], h)
