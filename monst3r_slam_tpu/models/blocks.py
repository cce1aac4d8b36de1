"""Transformer primitives: layernorm, MLP, self/cross attention with RoPE2D.

Functional equivalents of `croco/models/blocks.py` (Attention:81, Block:114,
CrossAttention:132, DecoderBlock:171), written for TPU: batched einsum matmuls
land on the MXU; layernorm/softmax run in float32 regardless of the compute
dtype; attention uses `jax.nn.dot_product_attention` (XLA's fused path) with
RoPE applied to q/k beforehand.

Parameters are plain dict pytrees. Linear weights are stored (in, out) —
the converter transposes torch's (out, in).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.models.rope import apply_rope2d


def linear(p, x: jax.Array) -> jax.Array:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layernorm(p, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def mlp(p, x: jax.Array) -> jax.Array:
    """fc1 -> GELU -> fc2 (blocks.py:59-80). GELU is the exact (erf) variant,
    matching torch nn.GELU's default."""
    h = jax.nn.gelu(linear(p["fc1"], x), approximate=False)
    return linear(p["fc2"], h)


def _heads_split(x: jax.Array, n_heads: int) -> jax.Array:
    b, n, d = x.shape
    return x.reshape(b, n, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _heads_merge(x: jax.Array) -> jax.Array:
    b, h, n, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * hd)


def _sdpa(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Softmax attention on (B, H, N, hd); accumulation in f32.

    Dispatches to the Pallas fused on-chip kernel on TPU (ops/attention.py);
    XLA einsum path elsewhere.
    """
    from monst3r_slam_tpu.ops.attention import sdpa

    return sdpa(q, k, v)


def self_attention(
    p, x: jax.Array, pos: jax.Array, n_heads: int, rope_freq: Optional[float]
) -> jax.Array:
    """Fused-QKV self attention with RoPE2D on q and k (blocks.py:81-111)."""
    qkv = linear(p["qkv"], x)  # (B, N, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_heads_split(t, n_heads) for t in (q, k, v))
    if rope_freq is not None:
        q = apply_rope2d(q, pos, rope_freq)
        k = apply_rope2d(k, pos, rope_freq)
    out = _sdpa(q, k, v)
    return linear(p["proj"], _heads_merge(out))


def cross_attention(
    p,
    x: jax.Array,
    mem: jax.Array,
    xpos: jax.Array,
    mpos: jax.Array,
    n_heads: int,
    rope_freq: Optional[float],
    mem_bias: Optional[jax.Array] = None,
    return_attn_colsum: bool = False,
):
    """Separate q/k/v projections (blocks.py:132-169).

    `mem_bias` (B, Nk) is added to every query's logits — the Easi3R-style
    attention re-weighting hook (down-weights dynamic memory tokens).
    `return_attn_colsum` also returns the per-memory-token attention mass
    sum_q A[q, k] (B, Nk), used to build the dynamic mask.
    """
    q = _heads_split(linear(p["q"], x), n_heads)
    k = _heads_split(linear(p["k"], mem), n_heads)
    v = _heads_split(linear(p["v"], mem), n_heads)
    if rope_freq is not None:
        q = apply_rope2d(q, xpos, rope_freq)
        k = apply_rope2d(k, mpos, rope_freq)
    if mem_bias is None and not return_attn_colsum:
        out = _sdpa(q, k, v)
        return linear(p["proj"], _heads_merge(out))
    # Explicit-logits path (bias / attention statistics needed)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mem_bias is not None:
        logits = logits + mem_bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)
    y = linear(p["proj"], _heads_merge(out))
    if return_attn_colsum:
        colsum = jnp.sum(probs, axis=(1, 2)) / probs.shape[1]  # (B, Nk)
        return y, colsum
    return y


def encoder_block(
    p, x: jax.Array, pos: jax.Array, n_heads: int, rope_freq: float, eps: float
) -> jax.Array:
    """Pre-LN ViT block (blocks.py:114-130)."""
    x = x + self_attention(p["attn"], layernorm(p["norm1"], x, eps), pos, n_heads, rope_freq)
    x = x + mlp(p["mlp"], layernorm(p["norm2"], x, eps))
    return x


def decoder_block(
    p,
    x: jax.Array,
    y: jax.Array,
    xpos: jax.Array,
    ypos: jax.Array,
    n_heads: int,
    rope_freq: float,
    eps: float,
    mem_bias: Optional[jax.Array] = None,
    return_attn_colsum: bool = False,
):
    """Self-attn + cross-attn + MLP block (blocks.py:171-192).

    `norm_y` normalizes the memory stream inside each block (norm_im2_in_dec).
    """
    x = x + self_attention(p["attn"], layernorm(p["norm1"], x, eps), xpos, n_heads, rope_freq)
    y_n = layernorm(p["norm_y"], y, eps)
    ca = cross_attention(
        p["cross"], layernorm(p["norm2"], x, eps), y_n, xpos, ypos, n_heads,
        rope_freq, mem_bias=mem_bias, return_attn_colsum=return_attn_colsum,
    )
    if return_attn_colsum:
        ca, colsum = ca
    x = x + ca
    x = x + mlp(p["mlp"], layernorm(p["norm3"], x, eps))
    if return_attn_colsum:
        return x, colsum
    return x
