"""Top-level two-view pointmap model API (MASt3R / MonST3R / DUSt3R).

Functional equivalents of the reference inference wrappers
(`mast3r_slam/mast3r_utils.py`: decoder:38, mast3r_inference_mono:122,
mast3r_asymmetric_inference:187, mast3r_symmetric_inference:59), built so each
public function is a single jit-compiled, fixed-shape program:

  * `encode(params, cfg, img)`         — ViT-L encoder (the per-frame cache)
  * `decode(params, cfg, featA, featB)`— dual decoder + heads for the ordered
    pair (A, B); returns per-view X, C, D, Q.
  * `inference_mono`                   — pair (A, A)
  * `inference_sym`                    — both orders, batched together so the
    4 decoder passes of the reference (`mast3r_utils.py:59-86`) become ONE
    batched pass of size 2.

Images are NHWC float32 normalized with (x - 0.5)/0.5 (dust3r ImgNorm).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.models import croco, heads
from monst3r_slam_tpu.models.config import ModelConfig


class PairOutput(NamedTuple):
    """Per-pixel outputs for both views of a decoded pair.

    X: pointmaps (B, H, W, 3) — view-2 points live in view-1's frame.
    C: pointmap confidence (B, H, W)
    D: descriptors (B, H, W, desc_dim) or None
    Q: descriptor confidence (B, H, W) or None
    """

    X1: jax.Array
    C1: jax.Array
    D1: Optional[jax.Array]
    Q1: Optional[jax.Array]
    X2: jax.Array
    C2: jax.Array
    D2: Optional[jax.Array]
    Q2: Optional[jax.Array]


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def encode(params, cfg: ModelConfig, img: jax.Array, dtype=jnp.bfloat16):
    """img (B, H, W, 3) -> (feat (B, N, enc_dim) float32, pos (B, N, 2))."""
    return croco.encode_image(params, cfg, img, dtype)


@partial(jax.jit, static_argnames=("cfg", "shape", "dtype", "fused_heads"))
def decode(
    params,
    cfg: ModelConfig,
    feat1: jax.Array,
    pos1: jax.Array,
    feat2: jax.Array,
    pos2: jax.Array,
    shape,
    dtype=jnp.bfloat16,
    fused_heads: bool = False,
) -> PairOutput:
    """Decoder + downstream heads for the ordered pair (1, 2).

    `shape` is the static (H, W) image shape; N must equal H*W/patch^2.

    `fused_heads` runs head1+head2 as ONE vmapped pass over stacked head
    params: XLA lowers the two batch-B conv chains into a single
    grouped-conv chain of batch 2B (feature_group_count batching rule), so
    each DPT/regression conv launches once instead of twice. NEGATIVE
    RESULT on v5e at 384x512 (scripts/profile_decode.py): full decode
    22.6 ms -> 33.4 ms fused — grouped convs hit a slower conv path than
    two sequential dense convs here. Default stays off.
    """
    h, w = shape
    n_h, n_w = h // cfg.patch_size, w // cfg.patch_size
    dec1, dec2 = croco.decode_pair(params, cfg, feat1, pos1, feat2, pos2, dtype)
    if fused_heads:
        stacked = jax.tree.map(
            lambda a, b: jnp.stack([a, b]), params["head1"], params["head2"]
        )
        dec = tuple(jnp.stack([a, b]) for a, b in zip(dec1, dec2))
        outs = jax.vmap(
            lambda hp, df: heads.head_forward(hp, cfg, df, n_h, n_w)
        )(stacked, dec)
        out1 = heads.HeadOutput(*[None if t is None else t[0] for t in outs])
        out2 = heads.HeadOutput(*[None if t is None else t[1] for t in outs])
    else:
        out1 = heads.head_forward(params["head1"], cfg, dec1, n_h, n_w)
        out2 = heads.head_forward(params["head2"], cfg, dec2, n_h, n_w)
    return PairOutput(
        out1.pts3d, out1.conf, out1.desc, out1.desc_conf,
        out2.pts3d, out2.conf, out2.desc, out2.desc_conf,
    )


def inference_mono(params, cfg: ModelConfig, feat, pos, shape) -> PairOutput:
    """Self-pair decode (reference mast3r_inference_mono, mast3r_utils.py:122)."""
    return decode(params, cfg, feat, pos, feat, pos, shape)


def inference_sym(params, cfg: ModelConfig, feat_i, pos_i, feat_j, pos_j, shape):
    """Symmetric inference: decode (i, j) and (j, i) in ONE batched pass.

    The reference runs 4 separate decoder passes per pair
    (`mast3r_utils.py:59-86`); batching both orders doubles MXU utilization
    per launch. Returns (out_ij, out_ji) where out_ij covers (Xii, Xji, ...).
    """
    feat1 = jnp.concatenate([feat_i, feat_j], axis=0)
    feat2 = jnp.concatenate([feat_j, feat_i], axis=0)
    pos1 = jnp.concatenate([pos_i, pos_j], axis=0)
    pos2 = jnp.concatenate([pos_j, pos_i], axis=0)
    out = decode(params, cfg, feat1, pos1, feat2, pos2, shape)
    b = feat_i.shape[0]

    def split(t):
        return (t[:b], t[b:]) if t is not None else (None, None)

    (X11, X22), (C11, C22), (D11, D22), (Q11, Q22) = map(
        split, (out.X1, out.C1, out.D1, out.Q1)
    )
    (X21, X12), (C21, C12), (D21, D12), (Q21, Q12) = map(
        split, (out.X2, out.C2, out.D2, out.Q2)
    )
    out_ij = PairOutput(X11, C11, D11, Q11, X21, C21, D21, Q21)
    out_ji = PairOutput(X22, C22, D22, Q22, X12, C12, D12, Q12)
    return out_ij, out_ji
