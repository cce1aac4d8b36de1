"""Easi3R-style attention-based dynamic handling (training-free).

The reference's Easi3R integration (`mast3r_slam/easi3r_utils.py:53-150`)
calls into an empty vendored submodule; this module implements the core
mechanism natively (Easi3R, Chen et al. 2025: dynamic regions receive
anomalous cross-view attention in DUSt3R-style decoders; a second inference
with attention re-weighting suppresses them):

  1. First decoder pass collects, per memory token, the total cross-attention
     mass it receives from the other view, averaged over layers/heads.
  2. Tokens whose received attention is anomalously LOW (the other view
     cannot ground them — typical of moving objects) form a patch-level
     dynamic mask via robust (median/MAD) thresholding.
  3. Second pass re-weights cross-attention with a log-bias that suppresses
     masked memory tokens; its pointmaps are returned along with per-pixel
     dynamic masks (patch mask upsampled by the patch size).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.models import blocks, heads
from monst3r_slam_tpu.models.config import ModelConfig


def _decode_pair_attn(
    params, cfg: ModelConfig, feat1, pos1, feat2, pos2,
    bias1=None, bias2=None, dtype=jnp.bfloat16,
):
    """decode_pair variant that accumulates cross-attention column sums and
    accepts per-memory-token log-biases (bias1 applies to stream1's memory =
    view 2 tokens; bias2 to view 1 tokens)."""
    f1 = blocks.linear(params["decoder_embed"], feat1.astype(dtype))
    f2 = blocks.linear(params["decoder_embed"], feat2.astype(dtype))

    def body(carry, blk_params):
        x1, x2, acc2, acc1 = carry
        p1, p2 = blk_params
        n1, cs2 = blocks.decoder_block(
            p1, x1, x2, pos1, pos2, cfg.dec_heads, cfg.rope_freq, cfg.ln_eps,
            mem_bias=bias1, return_attn_colsum=True,
        )
        n2, cs1 = blocks.decoder_block(
            p2, x2, x1, pos2, pos1, cfg.dec_heads, cfg.rope_freq, cfg.ln_eps,
            mem_bias=bias2, return_attn_colsum=True,
        )
        return (n1, n2, acc2 + cs2, acc1 + cs1), (n1, n2)

    B, N2 = feat2.shape[:2]
    N1 = feat1.shape[1]
    init = (f1, f2, jnp.zeros((B, N2)), jnp.zeros((B, N1)))
    (_, _, attn2, attn1), (outs1, outs2) = jax.lax.scan(
        body, init, (params["dec_blocks"], params["dec_blocks2"])
    )
    h1, h2, h3 = cfg.hooks[1] - 1, cfg.hooks[2] - 1, cfg.hooks[3] - 1
    final1 = blocks.layernorm(params["dec_norm"], outs1[h3], cfg.ln_eps)
    final2 = blocks.layernorm(params["dec_norm"], outs2[h3], cfg.ln_eps)

    def f32(t):
        return t.astype(jnp.float32)

    dec1 = (f32(feat1), f32(outs1[h1]), f32(outs1[h2]), f32(final1))
    dec2 = (f32(feat2), f32(outs2[h1]), f32(outs2[h2]), f32(final2))
    # Normalize: average received-attention per layer; each query row sums to
    # 1, so a token's expected share is Nq/Nk ~ 1
    attn1 = attn1 / cfg.dec_depth / (N2 / N1)
    attn2 = attn2 / cfg.dec_depth / (N1 / N2)
    return dec1, dec2, attn1, attn2


def attention_dynamic_mask(attn: jax.Array, k_mad: float = 2.0) -> jax.Array:
    """Patch-level dynamic mask from received-attention statistics.

    attn: (B, N) average attention mass per token. Dynamic tokens receive
    anomalously little; threshold at median - k_mad * MAD.
    """
    med = jnp.median(attn, axis=-1, keepdims=True)
    mad = jnp.median(jnp.abs(attn - med), axis=-1, keepdims=True)
    return attn < (med - k_mad * jnp.maximum(mad, 1e-6))


class Easi3ROutput(NamedTuple):
    X1: jax.Array
    C1: jax.Array
    X2: jax.Array
    C2: jax.Array
    dyn_mask1: jax.Array  # (B, H, W) bool — per-pixel dynamic mask, view 1
    dyn_mask2: jax.Array


@partial(jax.jit, static_argnames=("cfg", "shape", "k_mad"))
def easi3r_double_inference_pair(
    params,
    cfg: ModelConfig,
    feat1, pos1, feat2, pos2,
    shape,
    k_mad: float = 2.0,
) -> Easi3ROutput:
    """Two-pass Easi3R inference (easi3r_utils.py:53-150 semantics, native).

    Pass 1 collects attention statistics -> patch dynamic masks; pass 2
    re-weights cross-attention against the masked tokens and produces the
    pointmaps. `params` is a DUSt3R-architecture parameter pytree.
    """
    h, w = shape
    p = cfg.patch_size
    n_h, n_w = h // p, w // p

    # Pass 1: statistics only
    _, _, attn1, attn2 = _decode_pair_attn(params, cfg, feat1, pos1, feat2, pos2)
    mask1 = attention_dynamic_mask(attn1, k_mad)  # (B, N1) view-1 tokens
    mask2 = attention_dynamic_mask(attn2, k_mad)

    # Pass 2: suppress dynamic memory tokens (finite log-bias, not -inf,
    # so fully-masked rows stay well-defined)
    bias1 = jnp.where(mask2, -10.0, 0.0)  # stream1's memory is view 2
    bias2 = jnp.where(mask1, -10.0, 0.0)
    dec1, dec2, _, _ = _decode_pair_attn(
        params, cfg, feat1, pos1, feat2, pos2, bias1=bias1, bias2=bias2
    )
    out1 = heads.head_forward(params["head1"], cfg, dec1, n_h, n_w)
    out2 = heads.head_forward(params["head2"], cfg, dec2, n_h, n_w)

    def upsample(mask):
        B = mask.shape[0]
        m = mask.reshape(B, n_h, n_w)
        return jnp.repeat(jnp.repeat(m, p, axis=1), p, axis=2)

    return Easi3ROutput(
        out1.pts3d, out1.conf, out2.pts3d, out2.conf,
        upsample(mask1), upsample(mask2),
    )
