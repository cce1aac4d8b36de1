"""CroCo ViT encoder and dual cross-attention decoder, TPU-first.

Replaces the reference's module-per-block torch graph
(`dust3r/model.py:127-190`, `croco/models/croco.py`) with `lax.scan` over
stacked block parameters: one compiled block body regardless of depth, weights
streamed from HBM per step.

The decoder returns the intermediate activations required by the DPT hooks
(indices 6, 9, 12 of the 13-entry list in the reference `_decoder`); we slice
them statically out of the scan's stacked outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.models import blocks
from monst3r_slam_tpu.models.config import ModelConfig
from monst3r_slam_tpu.models.rope import patch_positions


def patch_embed(p, img: jax.Array, patch: int):
    """img: (B, H, W, 3) NHWC -> tokens (B, N, D), positions (B, N, 2).

    The reference's 16x16/stride-16 conv (`blocks.py:209-248`) is exactly a
    per-patch linear layer; we reshape + matmul so it runs on the MXU.
    """
    b, h, w, c = img.shape
    n_h, n_w = h // patch, w // patch
    x = img.reshape(b, n_h, patch, n_w, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, n_h * n_w, patch * patch * c)
    tokens = blocks.linear(p["proj"], x)
    pos = patch_positions(n_h, n_w, b)
    return tokens, pos


def encode_image(params, cfg: ModelConfig, img: jax.Array, dtype=jnp.bfloat16):
    """Full encoder: patch embed + enc_depth blocks + final LN
    (`dust3r/model.py:127-139`). Returns (feat (B,N,enc_dim) f32, pos)."""
    tokens, pos = patch_embed(params["patch_embed"], img.astype(dtype), cfg.patch_size)

    def body(x, blk_params):
        x = blocks.encoder_block(
            blk_params, x, pos, cfg.enc_heads, cfg.rope_freq, cfg.ln_eps
        )
        return x, None

    x, _ = jax.lax.scan(body, tokens, params["enc_blocks"])
    x = blocks.layernorm(params["enc_norm"], x, cfg.ln_eps)
    return x.astype(jnp.float32), pos


def decode_pair(params, cfg: ModelConfig, feat1, pos1, feat2, pos2, dtype=jnp.bfloat16):
    """Dual-stream decoder (`dust3r/model.py:171-190`).

    Stream 1 runs `dec_blocks` cross-attending to stream 2 and vice versa for
    `dec_blocks2`, in lockstep (each step consumes the previous step's pair).

    Returns (hook activations for stream1, for stream2): tuples of
    (enc_feat, dec_mid1, dec_mid2, dec_final_normed) matching the DPT hook
    indices cfg.hooks; all f32.
    """
    f1 = blocks.linear(params["decoder_embed"], feat1.astype(dtype))
    f2 = blocks.linear(params["decoder_embed"], feat2.astype(dtype))

    def body(carry, blk_params):
        x1, x2 = carry
        p1, p2 = blk_params
        n1 = blocks.decoder_block(
            p1, x1, x2, pos1, pos2, cfg.dec_heads, cfg.rope_freq, cfg.ln_eps
        )
        n2 = blocks.decoder_block(
            p2, x2, x1, pos2, pos1, cfg.dec_heads, cfg.rope_freq, cfg.ln_eps
        )
        return (n1, n2), (n1, n2)

    (_, _), (outs1, outs2) = jax.lax.scan(
        body, (f1, f2), (params["dec_blocks"], params["dec_blocks2"])
    )
    # outs*: (dec_depth, B, N, dec_dim); hook h means "decoder block h output"
    # for h >= 1 (hook 0 is the raw encoder feature).
    h1, h2, h3 = cfg.hooks[1] - 1, cfg.hooks[2] - 1, cfg.hooks[3] - 1
    final1 = blocks.layernorm(params["dec_norm"], outs1[h3], cfg.ln_eps)
    final2 = blocks.layernorm(params["dec_norm"], outs2[h3], cfg.ln_eps)

    # Hook activations stay in the compute dtype; the heads cast their final
    # regression maps to f32 before the numerically-sensitive postprocess
    # (reg_dense_depth expm1 / descriptor L2-normalization).
    def cd(t):
        return t.astype(dtype)

    dec1 = (cd(feat1), cd(outs1[h1]), cd(outs1[h2]), cd(final1))
    dec2 = (cd(feat2), cd(outs2[h1]), cd(outs2[h2]), cd(final2))
    return dec1, dec2
