"""2D rotary position embedding (RoPE2D).

Matches the reference `croco/models/pos_embed.py:105-160`: the per-head
feature dim is split in half; the first half is rotated by the patch's y
position, the second by its x position, each with standard 1D RoPE at base
frequency `freq` (100 for the MASt3R/MonST3R checkpoints).

Positions are computed directly (no host-side cache): the tables are tiny and
fuse into the surrounding kernels under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_cos_sin(pos1d: jax.Array, dim: int, freq: float):
    """pos1d: (..., N) integer positions -> cos/sin of shape (..., N, dim).

    `dim` is the per-axis rotation dim (head_dim // 2); angles use dim//2
    distinct frequencies duplicated twice, as in the reference.
    """
    half = dim // 2
    inv_freq = 1.0 / (freq ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / dim))
    angles = pos1d[..., None].astype(jnp.float32) * inv_freq  # (..., N, half)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (..., N, dim)
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope2d(tokens: jax.Array, pos: jax.Array, freq: float) -> jax.Array:
    """tokens: (B, H, N, hd), pos: (B, N, 2) int (y, x) -> rotated tokens.

    hd must be divisible by 4 (two halves, each with paired rotation dims).
    """
    hd = tokens.shape[-1]
    assert hd % 4 == 0, "RoPE2D needs head_dim % 4 == 0"
    d2 = hd // 2
    y_tok, x_tok = jnp.split(tokens, 2, axis=-1)
    out = []
    for tok, p in ((y_tok, pos[..., 0]), (x_tok, pos[..., 1])):
        cos, sin = rope_cos_sin(p, d2, freq)  # (B, N, d2)
        cos = cos[:, None, :, :].astype(tokens.dtype)
        sin = sin[:, None, :, :].astype(tokens.dtype)
        out.append(tok * cos + _rotate_half(tok) * sin)
    return jnp.concatenate(out, axis=-1)


def patch_positions(n_h: int, n_w: int, batch: int) -> jax.Array:
    """Row-major (y, x) patch positions, (B, n_h*n_w, 2) int32.

    Matches `PositionGetter` (`croco/models/blocks.py:195-207`).
    """
    y = jax.lax.broadcasted_iota(jnp.int32, (n_h, n_w), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (n_h, n_w), 1)
    pos = jnp.stack([y, x], axis=-1).reshape(1, n_h * n_w, 2)
    return jnp.broadcast_to(pos, (batch, n_h * n_w, 2))
