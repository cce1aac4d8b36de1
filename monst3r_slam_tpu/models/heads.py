"""Pointmap + descriptor heads and activation post-processing.

Ports the semantics of `dust3r/heads/postprocess.py` (reg_dense_depth,
reg_dense_conf) and the catMLP local-feature head
(`mast3r/catmlp_dpt_head.py:42-96`) to functional JAX, NHWC.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.models import blocks
from monst3r_slam_tpu.models.config import ModelConfig
from monst3r_slam_tpu.models.dpt import dpt_forward


class HeadOutput(NamedTuple):
    """Per-pixel model outputs (all NHWC / NHW)."""

    pts3d: jax.Array  # (B, H, W, 3)
    conf: jax.Array  # (B, H, W)
    desc: Optional[jax.Array]  # (B, H, W, desc_dim) L2-normalized
    desc_conf: Optional[jax.Array]  # (B, H, W)


def reg_dense_depth(xyz: jax.Array, mode) -> jax.Array:
    """postprocess.py:22-45; 'exp' mode: direction * expm1(norm)."""
    name, vmin, vmax = mode
    if name == "linear":
        return xyz
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz = xyz / jnp.clip(d, 1e-8)
    if name == "square":
        return xyz * jnp.square(d)
    if name == "exp":
        # Clip keeps f32 finite under untrained weights (expm1(40) ~ 2e17,
        # still squarable in f32); trained checkpoints never reach it.
        return xyz * jnp.expm1(jnp.minimum(d, 40.0))
    raise ValueError(f"bad depth mode {name}")


def reg_dense_conf(x: jax.Array, mode) -> jax.Array:
    """postprocess.py:48-57; 'exp' mode: vmin + exp(x) clipped to vmax-vmin."""
    name, vmin, vmax = mode
    if name == "exp":
        return vmin + jnp.clip(jnp.exp(x), None, vmax - vmin)
    if name == "sigmoid":
        return (vmax - vmin) * jax.nn.sigmoid(x) + vmin
    raise ValueError(f"bad conf mode {name}")


def pixel_shuffle_nhwc(x: jax.Array, r: int) -> jax.Array:
    """(B, h, w, C*r*r) -> (B, h*r, w*r, C), channel-major sub-pixel order.

    Matches torch.pixel_shuffle on the NCHW tensor produced at
    `catmlp_dpt_head.py:82-84`: channel index c*r*r + i*r + j maps to output
    pixel offset (i, j) of channel c.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c
    return x.reshape(b, h * r, w * r, c)


def head_forward(
    params,
    cfg: ModelConfig,
    dec_feats,
    n_h: int,
    n_w: int,
) -> HeadOutput:
    """One downstream head (`catmlp_dpt_head.py:75-96` forward).

    dec_feats: the 4 hook activations (enc_out, mid1, mid2, dec_final) in the
    model's compute dtype (bf16 for inference, f32 for parity testing); all
    matmul/conv-heavy work runs in that dtype, postprocess in f32.
    """
    h_img, w_img = n_h * cfg.patch_size, n_w * cfg.patch_size
    fmap = dpt_forward(params["dpt"], cfg, dec_feats, n_h, n_w)  # (B,H,W,4)
    fmap = fmap.astype(jnp.float32)

    pts3d = reg_dense_depth(fmap[..., 0:3], cfg.depth_mode)
    conf = reg_dense_conf(fmap[..., 3], cfg.conf_mode)

    if cfg.desc_dim is None:
        return HeadOutput(pts3d, conf, None, None)

    # catMLP local features on cat(enc, dec_final)
    cat = jnp.concatenate([dec_feats[0], dec_feats[3]], axis=-1)
    local = blocks.mlp(params["local_feat"], cat).astype(jnp.float32)
    b, n, _ = local.shape
    per_pix = cfg.desc_dim + (1 if cfg.two_confs else 0)
    # torch layout: (B, per_pix*P^2, n_h, n_w) then pixel_shuffle(P)
    local = local.reshape(b, n_h, n_w, per_pix * cfg.patch_size**2)
    local = pixel_shuffle_nhwc(local, cfg.patch_size)  # (B, H, W, per_pix)

    desc = local[..., : cfg.desc_dim]
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
    if cfg.two_confs:
        desc_conf = reg_dense_conf(local[..., cfg.desc_dim], cfg.desc_conf_mode)
    else:
        desc_conf = conf
    assert fmap.shape[1] == h_img and fmap.shape[2] == w_img
    return HeadOutput(pts3d, conf, desc, desc_conf)
