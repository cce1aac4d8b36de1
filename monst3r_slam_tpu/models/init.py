"""Random parameter initialization (for tests/benchmarks and training).

Produces the same pytree structure that `models/convert.py` fills from torch
checkpoints. Encoder/decoder block parameters are stacked along a leading
depth axis for `lax.scan`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.models.config import ModelConfig


def _linear(key, d_in, d_out, bias=True, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    scale = math.sqrt(2.0 / (d_in + d_out))
    p = {"w": scale * jax.random.normal(k1, (d_in, d_out), dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _ln(d, dtype=jnp.float32):
    return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def _conv(key, kh, kw, ci, co, bias=True, dtype=jnp.float32):
    scale = math.sqrt(2.0 / (kh * kw * ci))
    p = {"w": scale * jax.random.normal(key, (kh, kw, ci, co), dtype)}
    if bias:
        p["b"] = jnp.zeros((co,), dtype)
    return p


def _enc_block(key, cfg: ModelConfig):
    ks = jax.random.split(key, 4)
    d = cfg.enc_dim
    return {
        "norm1": _ln(d),
        "attn": {"qkv": _linear(ks[0], d, 3 * d), "proj": _linear(ks[1], d, d)},
        "norm2": _ln(d),
        "mlp": {
            "fc1": _linear(ks[2], d, cfg.mlp_ratio * d),
            "fc2": _linear(ks[3], cfg.mlp_ratio * d, d),
        },
    }


def _dec_block(key, cfg: ModelConfig):
    ks = jax.random.split(key, 8)
    d = cfg.dec_dim
    return {
        "norm1": _ln(d),
        "attn": {"qkv": _linear(ks[0], d, 3 * d), "proj": _linear(ks[1], d, d)},
        "norm2": _ln(d),
        "norm3": _ln(d),
        "norm_y": _ln(d),
        "cross": {
            "q": _linear(ks[2], d, d),
            "k": _linear(ks[3], d, d),
            "v": _linear(ks[4], d, d),
            "proj": _linear(ks[5], d, d),
        },
        "mlp": {
            "fc1": _linear(ks[6], d, cfg.mlp_ratio * d),
            "fc2": _linear(ks[7], cfg.mlp_ratio * d, d),
        },
    }


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _dpt(key, cfg: ModelConfig):
    ks = iter(jax.random.split(key, 40))
    ld = cfg.layer_dims
    fd = cfg.feature_dim
    acts = [
        {"conv": _conv(next(ks), 1, 1, cfg.dpt_in_dims[0], ld[0]),
         "up": {"w": 0.02 * jax.random.normal(next(ks), (4, 4, ld[0], ld[0])),
                "b": jnp.zeros((ld[0],))}},
        {"conv": _conv(next(ks), 1, 1, cfg.dpt_in_dims[1], ld[1]),
         "up": {"w": 0.02 * jax.random.normal(next(ks), (2, 2, ld[1], ld[1])),
                "b": jnp.zeros((ld[1],))}},
        {"conv": _conv(next(ks), 1, 1, cfg.dpt_in_dims[2], ld[2])},
        {"conv": _conv(next(ks), 1, 1, cfg.dpt_in_dims[3], ld[3]),
         "down": _conv(next(ks), 3, 3, ld[3], ld[3])},
    ]

    def fusion(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        return {
            "res1": {"conv1": _conv(k1, 3, 3, fd, fd), "conv2": _conv(k2, 3, 3, fd, fd)},
            "res2": {"conv1": _conv(k3, 3, 3, fd, fd), "conv2": _conv(k4, 3, 3, fd, fd)},
            "out_conv": _conv(k5, 1, 1, fd, fd),
        }

    return {
        "act": acts,
        "layer_rn": [_conv(next(ks), 3, 3, ld[i], fd, bias=False) for i in range(4)],
        "refine1": fusion(next(ks)),
        "refine2": fusion(next(ks)),
        "refine3": fusion(next(ks)),
        "refine4": fusion(next(ks)),
        "head": {
            "conv1": _conv(next(ks), 3, 3, fd, fd // 2),
            "conv2": _conv(next(ks), 3, 3, fd // 2, cfg.last_dim),
            # Near-zero final conv keeps untrained outputs in a sane range
            # (pts ~ 0, conf ~ vmin+1) — random init only; checkpoints override.
            "conv3": {
                "w": 0.01 * jax.random.normal(next(ks), (1, 1, cfg.last_dim, cfg.head_out_channels)),
                "b": jnp.zeros((cfg.head_out_channels,)),
            },
        },
    }


def _head(key, cfg: ModelConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    head = {"dpt": _dpt(k1, cfg)}
    if cfg.desc_dim is not None:
        idim = cfg.enc_dim + cfg.dec_dim
        out = (cfg.desc_dim + (1 if cfg.two_confs else 0)) * cfg.patch_size**2
        head["local_feat"] = {
            "fc1": _linear(k2, idim, int(cfg.desc_hidden_factor * idim)),
            "fc2": _linear(k3, int(cfg.desc_hidden_factor * idim), out),
        }
    return head


def init_params(key, cfg: ModelConfig):
    """Full two-view model parameter pytree."""
    ks = jax.random.split(key, 8)
    patch_in = cfg.patch_size**2 * 3
    enc_blocks = _stack([_enc_block(k, cfg) for k in jax.random.split(ks[0], cfg.enc_depth)])
    dec_blocks = _stack([_dec_block(k, cfg) for k in jax.random.split(ks[1], cfg.dec_depth)])
    dec_blocks2 = _stack([_dec_block(k, cfg) for k in jax.random.split(ks[2], cfg.dec_depth)])
    return {
        "patch_embed": {"proj": _linear(ks[3], patch_in, cfg.enc_dim)},
        "enc_blocks": enc_blocks,
        "enc_norm": _ln(cfg.enc_dim),
        "decoder_embed": _linear(ks[4], cfg.enc_dim, cfg.dec_dim),
        "dec_blocks": dec_blocks,
        "dec_blocks2": dec_blocks2,
        "dec_norm": _ln(cfg.dec_dim),
        "head1": _head(ks[5], cfg),
        "head2": _head(ks[6], cfg),
    }
