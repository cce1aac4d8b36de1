"""SAM2 (Segment Anything 2) image segmentation in JAX — the real-weights
path for the dynamic-mask refinement stage.

The reference refines its flow-error mask with a SAM2 *video* predictor
seeded by connected-component centroids (`monst3r_utils.py:640-703`,
`build_sam2_video_predictor:785`; submodule empty in the snapshot). This
module implements the SAM2 image pipeline from the published architecture
(Ravi et al., 2024) so the official `sam2_hiera_*.pt` checkpoints can be
converted and run on TPU:

  * **Hiera-Det image encoder**: 7x7/s4 patch embed; 4 stages of windowed
    multi-scale attention blocks with q-pooling at stage transitions and
    designated global-attention blocks; absolute `pos_embed` (interpolated)
    plus tiled `pos_embed_window`.
  * **FPN neck**: per-scale 1x1 convs to 256 ch, top-down sum fusion of the
    two lowest-res levels (SAM2's `fpn_top_down_levels=[2, 3]`).
  * **Prompt encoder**: random-Fourier positional encoding of point prompts
    + learned per-type embeddings (pos/neg point, and the required
    not-a-point padding token).
  * **Mask decoder**: IoU + mask output tokens, a 2-layer two-way
    transformer (token self-attn, token->image cross-attn, MLP,
    image->token cross-attn), transposed-conv upscaling with the two
    high-res skip features, per-token hypernetwork MLPs, IoU head.

Temporal propagation (SAM2's memory attention) is NOT ported: the native
`TemporalMaskPropagator` (dynamic/refine.py) carries masks across frames in
its place — memory attention would re-run a second ViT per frame for a role
the flow warp already fills at ~1000x less compute.

The per-frame role in the SLAM loop is exposed through `Sam2Refiner`
(`dynamic.mask.set_mask_refiner`-compatible): point prompts from
connected-component centroids of the raw flow-error mask, exactly like the
reference's seeding (`monst3r_utils.py:651-680`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SAM2Config(NamedTuple):
    # Hiera trunk
    embed_dim: int = 112
    num_heads: int = 2  # heads in stage 1 (doubles per stage)
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (14, 14)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    # neck / decoder
    d_model: int = 256
    num_mask_tokens: int = 4
    dec_depth: int = 2
    dec_heads: int = 8
    dec_mlp_dim: int = 2048
    iou_head_depth: int = 3
    img_size: int = 1024  # native SAM2 input resolution (multiple of 32)


# Hiera-B+ (sam2_hiera_base_plus.pt / sam2_hiera_b+.yaml)
SAM2_BASE_PLUS = SAM2Config()
# Hiera-S (sam2_hiera_small.pt): embed 96, stages (1, 2, 11, 2)
SAM2_SMALL = SAM2Config(
    embed_dim=96, stages=(1, 2, 11, 2), global_att_blocks=(7, 10, 13),
)
# Hiera-T (sam2_hiera_tiny.pt): embed 96, stages (1, 2, 7, 2)
SAM2_TINY = SAM2Config(
    embed_dim=96, stages=(1, 2, 7, 2), global_att_blocks=(5, 7, 9),
)
# Test-size config
SAM2_TEST = SAM2Config(
    embed_dim=16, num_heads=1, stages=(1, 1, 2, 1), global_att_blocks=(2,),
    window_spec=(4, 2, 4, 2), d_model=32, dec_heads=2, dec_mlp_dim=64,
    img_size=128,
)


# ---------------------------------------------------------------------------
# Common primitives
# ---------------------------------------------------------------------------


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _layer_norm(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]).astype(x.dtype)


def _conv2d(p, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _conv2d_transpose(p, x):
    """ConvTranspose2d with kernel == stride == 2 (SAM's upscaler): exact
    einsum form y[2i+di, 2j+dj] = x[i, j] @ w[di, dj] — unambiguous w.r.t.
    torch's kernel orientation and MXU-friendly. w: (2, 2, I, O)."""
    w = p["w"].astype(x.dtype)
    B, H, W, _ = x.shape
    O = w.shape[-1]
    pieces = jnp.einsum("bhwi,dkio->bhdwko", x, w)
    y = pieces.reshape(B, 2 * H, 2 * W, O)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _mlp_block(p, x):
    return _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], x), approximate=False))


# ---------------------------------------------------------------------------
# Hiera trunk
# ---------------------------------------------------------------------------


def _window_partition(x, ws):
    """(B, H, W, C) -> (B*nH*nW, ws, ws, C) with zero pad to a ws multiple."""
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    return (
        x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C),
        (Hp, Wp),
    )


def _window_unpartition(wins, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = wins.shape[0] // ((Hp // ws) * (Wp // ws))
    x = wins.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _attention(q, k, v, heads):
    """q (B, Nq, C), k/v (B, Nk, C) -> (B, Nq, C), multi-head."""
    B, Nq, C = q.shape
    Nk = k.shape[1]
    hd = C // heads
    q = q.reshape(B, Nq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Nk, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Nk, heads, hd).transpose(0, 2, 1, 3)
    a = jax.nn.softmax(
        (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hd), axis=-1
    )
    return (a @ v).transpose(0, 2, 1, 3).reshape(B, Nq, C)


def _hiera_block(p, x, heads, ws, q_stride):
    """One HieraBlock on (B, H, W, C_in). q_stride=2 at stage transitions
    (q-pooling: 2x2 maxpool on the query path + channel-doubling proj)."""
    B, H, W, _ = x.shape
    shortcut = x
    xn = _layer_norm(p["norm1"], x)
    if "proj" in p:
        # dim change: shortcut goes through proj AND the query pooling
        shortcut = _linear(p["proj"], xn)
        if q_stride > 1:
            shortcut = jax.lax.reduce_window(
                shortcut, -jnp.inf, jax.lax.max,
                (1, q_stride, q_stride, 1), (1, q_stride, q_stride, 1), "SAME",
            )
    C_out = p["attn"]["qkv"]["w"].shape[-1] // 3
    qkv = _linear(p["attn"]["qkv"], xn).reshape(B, H * W, 3, C_out)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = q.reshape(B, H, W, C_out)
    k = k.reshape(B, H, W, C_out)
    v = v.reshape(B, H, W, C_out)
    if q_stride > 1:
        q = jax.lax.reduce_window(
            q, -jnp.inf, jax.lax.max,
            (1, q_stride, q_stride, 1), (1, q_stride, q_stride, 1), "SAME",
        )
        Hq, Wq = q.shape[1], q.shape[2]
    else:
        Hq, Wq = H, W

    if ws > 0:
        # windowed attention: window k/v at ws, q at ws//q_stride
        wq = ws // q_stride if q_stride > 1 else ws
        qw, pad_q = _window_partition(q, wq)
        kw, _ = _window_partition(k, ws)
        vw, _ = _window_partition(v, ws)
        nq = qw.shape[0]
        ow = _attention(
            qw.reshape(nq, -1, C_out), kw.reshape(nq, -1, C_out),
            vw.reshape(nq, -1, C_out), heads,
        ).reshape(nq, wq, wq, C_out)
        o = _window_unpartition(ow, wq, pad_q, (Hq, Wq))
    else:
        o = _attention(
            q.reshape(B, Hq * Wq, C_out), k.reshape(B, H * W, C_out),
            v.reshape(B, H * W, C_out), heads,
        ).reshape(B, Hq, Wq, C_out)
    o = _linear(p["attn"]["proj"], o)
    x = shortcut + o
    return x + _mlp_block(p["mlp"], _layer_norm(p["norm2"], x))


def hiera_forward(p, cfg: SAM2Config, x):
    """x (B, H, W, 3) normalized -> list of 4 stage outputs (1/4..1/32)."""
    # 7x7/s4 with explicit (3, 3) padding: torch's PatchEmbed pads 3 on
    # BOTH sides; XLA "SAME" would pad (1, 2) and shift every window ~2 px.
    x = _conv2d(p["patch_embed"], x, stride=4, padding=((3, 3), (3, 3)))
    B, H, W, C = x.shape
    # pos embed: background interpolated to (H, W) + tiled window embed
    pe = jax.image.resize(
        p["pos_embed"], (1, H, W, C), method="bicubic"
    )
    pw = p["pos_embed_window"]
    wh, ww = pw.shape[1], pw.shape[2]
    reps = (1, -(-H // wh), -(-W // ww), 1)
    pe = pe + jnp.tile(pw, reps)[:, :H, :W]
    x = x + pe

    outs = []
    idx = 0
    heads = cfg.num_heads
    stage_ends = np.cumsum(cfg.stages) - 1
    q_pool_blocks = set(int(e) + 1 for e in stage_ends[:-1])
    stage = 0
    for blk in p["blocks"]:
        is_global = idx in cfg.global_att_blocks
        q_stride = 2 if idx in q_pool_blocks else 1
        # official hieradet.py computes window_size BEFORE the stage
        # increment ("lags by a block"): a stage-transition block runs at the
        # PREVIOUS stage's window while already using the new width/heads
        ws_stage = stage
        if q_stride > 1:
            stage += 1
            heads = heads * 2
        ws = 0 if is_global else cfg.window_spec[ws_stage]
        x = _hiera_block(blk, x, heads, ws, q_stride)
        if idx in stage_ends:
            outs.append(x)
        idx += 1
    return outs


def neck_forward(p, cfg: SAM2Config, feats):
    """FPN neck: 1x1 conv each scale to d_model; top-down sum fusion on the
    two lowest-res levels (fpn_top_down_levels=[2,3] in the sam2 configs,
    i.e. 1/16 and 1/32). Returns [1/4, 1/8, 1/16, 1/32] at d_model ch.

    `p["convs"]` is stored ASCENDING (convs[i] consumes feats[i], 1/4 first);
    the official checkpoint stores them DESCENDING (convs.0 = 1/32, matching
    backbone_channel_list=[896, 448, ...]) — the converter reverses."""
    lat = [_conv2d(pc, f) for pc, f in zip(p["convs"], feats)]
    out = [None] * len(lat)
    prev = None
    for i in range(len(lat) - 1, -1, -1):
        x = lat[i]
        if prev is not None and i >= len(lat) - 2:  # top-down into level 2
            up = jax.image.resize(
                prev, (x.shape[0], x.shape[1], x.shape[2], x.shape[3]),
                method="nearest",
            )
            x = x + up
        out[i] = x
        prev = x
    return out


# ---------------------------------------------------------------------------
# Prompt encoder
# ---------------------------------------------------------------------------


def _pe_encode(pe_gaussian, coords01):
    """Random-Fourier positional encoding: coords01 (..., 2) in [0,1]."""
    c = coords01 * 2.0 - 1.0
    c = c @ pe_gaussian  # (..., d_model/2)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def encode_points(p, cfg: SAM2Config, points01, labels):
    """points01 (B, N, 2) in [0,1]; labels (B, N) {1 pos, 0 neg, -1 pad}.

    Returns sparse prompt embeddings (B, N+1, d_model) — SAM always appends
    a padding point when no box is given.
    """
    B, N, _ = points01.shape
    pad_pt = jnp.zeros((B, 1, 2), points01.dtype)
    pad_lb = -jnp.ones((B, 1), labels.dtype)
    pts = jnp.concatenate([points01, pad_pt], axis=1)
    lbs = jnp.concatenate([labels, pad_lb], axis=1)
    emb = _pe_encode(p["pe_gaussian"], pts)
    emb = jnp.where(
        (lbs == -1)[..., None], p["not_a_point"][None, None], emb
    )
    emb = emb + jnp.where(
        (lbs == 1)[..., None], p["point_pos"][None, None], 0.0
    )
    emb = emb + jnp.where(
        (lbs == 0)[..., None], p["point_neg"][None, None], 0.0
    )
    return emb


def dense_pe(p, hw):
    """Positional encoding grid for the image embedding (H16, W16, d)."""
    h, w = hw
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # (h, w, 2)
    return _pe_encode(p["pe_gaussian"], grid)


# ---------------------------------------------------------------------------
# Mask decoder (two-way transformer)
# ---------------------------------------------------------------------------


def _twoway_layer(p, cfg, tokens, img, tok_pe, img_pe, skip_first_pe):
    q = tokens if skip_first_pe else tokens + tok_pe
    attn_out = _linear(
        p["self_attn"]["out"],
        _attention(
            _linear(p["self_attn"]["q"], q),
            _linear(p["self_attn"]["k"], q),
            _linear(p["self_attn"]["v"], tokens),
            cfg.dec_heads,
        ),
    )
    # official TwoWayAttentionBlock: the skip_first_layer_pe layer REPLACES
    # the queries with the attention output (no residual); later layers add
    tokens = attn_out if skip_first_pe else tokens + attn_out
    tokens = _layer_norm(p["norm1"], tokens)
    # token -> image cross attention (queries downscaled to C/2 in SAM)
    tokens = tokens + _linear(
        p["cross_t2i"]["out"],
        _attention(
            _linear(p["cross_t2i"]["q"], tokens + tok_pe),
            _linear(p["cross_t2i"]["k"], img + img_pe),
            _linear(p["cross_t2i"]["v"], img),
            cfg.dec_heads,
        ),
    )
    tokens = _layer_norm(p["norm2"], tokens)
    tokens = tokens + _mlp_block(p["mlp"], tokens)
    tokens = _layer_norm(p["norm3"], tokens)
    img = img + _linear(
        p["cross_i2t"]["out"],
        _attention(
            _linear(p["cross_i2t"]["q"], img + img_pe),
            _linear(p["cross_i2t"]["k"], tokens + tok_pe),
            _linear(p["cross_i2t"]["v"], tokens),
            cfg.dec_heads,
        ),
    )
    img = _layer_norm(p["norm4"], img)
    return tokens, img


def mask_decoder(p, cfg: SAM2Config, img_emb, img_pe, sparse_prompts, high_res_feats):
    """img_emb (B, H16, W16, d); sparse_prompts (B, Np, d);
    high_res_feats: [(B, H4, W4, d/8), (B, H8, W8, d/4)].

    Returns (masks (B, num_mask_tokens, H4, W4) logits, iou (B, num_mask_tokens),
    tokens_f (B, n_out + n_prompt, d) — the post-transformer token states;
    tokens_f[:, 0] is the object-score token and tokens_f[:, 2+m] the m-th
    mask token, consumed by the video predictor's object pointers
    (sam2_video.py).
    """
    B, H, W, C = img_emb.shape
    # token order matches SAM2's MaskDecoder.predict_masks:
    # [obj_score, iou, mask_0..mask_M-1, prompts...]
    out_tokens = jnp.concatenate(
        [p["obj_token"], p["iou_token"], p["mask_tokens"]], axis=0
    )  # (1 + 1 + M, C)
    n_out = out_tokens.shape[0]
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (B, n_out, C)), sparse_prompts],
        axis=1,
    )
    img = img_emb.reshape(B, H * W, C)
    pe = jnp.broadcast_to(img_pe.reshape(1, H * W, C), (B, H * W, C))
    tok_pe = tokens  # SAM uses the original tokens as their own PE
    for i, layer in enumerate(p["layers"]):
        tokens, img = _twoway_layer(
            layer, cfg, tokens, img, tok_pe, pe, skip_first_pe=(i == 0)
        )
    # final token->image attention
    tokens_f = tokens + _linear(
        p["final_t2i"]["out"],
        _attention(
            _linear(p["final_t2i"]["q"], tokens + tok_pe),
            _linear(p["final_t2i"]["k"], img + pe),
            _linear(p["final_t2i"]["v"], img),
            cfg.dec_heads,
        ),
    )
    tokens_f = _layer_norm(p["norm_final"], tokens_f)

    iou_tok = tokens_f[:, 1]
    mask_toks = tokens_f[:, 2 : 2 + cfg.num_mask_tokens]

    # upscale image embedding with high-res skips (SAM2's two-stage deconv)
    src = img.reshape(B, H, W, C)
    up1 = _conv2d_transpose(p["up1"], src) + high_res_feats[1]  # 1/8, C/4
    up1 = jax.nn.gelu(_layer_norm(p["up_norm"], up1), approximate=False)
    up2 = _conv2d_transpose(p["up2"], up1) + high_res_feats[0]  # 1/4, C/8
    up2 = jax.nn.gelu(up2, approximate=False)  # (B, H4, W4, C/8)

    # hypernetwork MLPs: one 3-layer MLP per mask token -> C/8
    hyper = []
    for m in range(cfg.num_mask_tokens):
        h = mask_toks[:, m]
        for li, lp in enumerate(p["hyper"][m]):
            h = _linear(lp, h)
            if li < len(p["hyper"][m]) - 1:
                h = jax.nn.relu(h)
        hyper.append(h)
    hyper = jnp.stack(hyper, axis=1)  # (B, M, C/8)
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up2)

    iou = iou_tok
    for li, lp in enumerate(p["iou_head"]):
        iou = _linear(lp, iou)
        if li < len(p["iou_head"]) - 1:
            iou = jax.nn.relu(iou)
    return masks, iou, tokens_f


# ---------------------------------------------------------------------------
# Full image pipeline
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def sam2_encode(params, cfg: SAM2Config, img):
    """img (1, H, W, 3) in [0,1] -> (img_emb 1/16, hr0 1/4, hr1 1/8).

    The expensive half (Hiera + neck); runs ONCE per frame regardless of how
    many objects are prompted.
    """
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (img - mean) / std
    feats = hiera_forward(params["trunk"], cfg, x)
    fpn = neck_forward(params["neck"], cfg, feats)
    # project high-res skips to the decoder's skip widths
    hr0 = _conv2d(params["dec"]["skip0"], fpn[0])  # 1/4 -> d/8
    hr1 = _conv2d(params["dec"]["skip1"], fpn[1])  # 1/8 -> d/4
    # the image predictor always adds the learned no-memory embedding to the
    # SAM-decoder feature level (sam2_base.py `directly_add_no_mem_embed`)
    return fpn[2] + params["no_mem_embed"], hr0, hr1


@partial(jax.jit, static_argnames=("cfg",))
def sam2_decode(params, cfg: SAM2Config, img_emb, hr0, hr1, points01, labels):
    """Prompt decode: points01 (B_obj, N, 2) in [0,1], labels (B_obj, N);
    image features (1, ...) broadcast over the object batch.

    Returns (masks (B_obj, M, H4*4, W4*4) logits at encoder input res,
    iou (B_obj, M)).
    """
    B = points01.shape[0]

    def bcast(t):
        return jnp.broadcast_to(t, (B,) + t.shape[1:])

    pe = dense_pe(params["prompt"], img_emb.shape[1:3])
    sparse = encode_points(params["prompt"], cfg, points01, labels)
    # with no mask prompt, the prompt encoder's dense output is the learned
    # no_mask_embed broadcast over the grid; predict_masks adds it to src
    src = img_emb + params["prompt"]["no_mask_embed"]
    masks, iou, _ = mask_decoder(
        params["dec"], cfg, bcast(src), pe, sparse, [bcast(hr0), bcast(hr1)]
    )
    M = masks.shape[1]
    h4, w4 = masks.shape[2], masks.shape[3]
    masks = jax.image.resize(
        masks, (B, M, 4 * h4, 4 * w4), method="bilinear"
    )
    return masks, iou


def sam2_image_forward(params, cfg: SAM2Config, img, points01, labels):
    """Convenience: encode + decode. img (1, H, W, 3); points01 (B_obj, N, 2).

    Returns (masks (B_obj, M, H, W) logits, iou (B_obj, M)).
    """
    img_emb, hr0, hr1 = sam2_encode(params, cfg, img)
    return sam2_decode(params, cfg, img_emb, hr0, hr1, points01, labels)


@partial(jax.jit, static_argnames=("cfg",))
def sam2_decode_select(params, cfg: SAM2Config, img_emb, hr0, hr1,
                       points01, labels):
    """Decode + device-side best-mask selection for the SLAM refiner.

    Selects among the MULTIMASK tokens only (tokens 1..3 — token 0 is the
    official single-mask output, never mixed into multimask selection),
    thresholds at logit 0 on device, and returns the H/4-resolution boolean
    masks: a (B, S/4, S/4) bool transfer instead of shipping the full
    (B, 4, S, S) f32 logits (~64 MB at S=1024) to the host.

    Returns (best_mask (B, H4, W4) bool, best_iou (B,)).
    """
    B = points01.shape[0]

    def bcast(t):
        return jnp.broadcast_to(t, (B,) + t.shape[1:])

    pe = dense_pe(params["prompt"], img_emb.shape[1:3])
    sparse = encode_points(params["prompt"], cfg, points01, labels)
    src = img_emb + params["prompt"]["no_mask_embed"]
    masks, iou, _ = mask_decoder(
        params["dec"], cfg, bcast(src), pe, sparse, [bcast(hr0), bcast(hr1)]
    )
    multi, miou = masks[:, 1:], iou[:, 1:]
    best = jnp.argmax(miou, axis=1)
    sel = jnp.take_along_axis(multi, best[:, None, None, None], axis=1)[:, 0]
    best_iou = jnp.take_along_axis(miou, best[:, None], axis=1)[:, 0]
    return sel > 0.0, best_iou


# ---------------------------------------------------------------------------
# SLAM refiner adapter (dynamic.mask.set_mask_refiner-compatible)
# ---------------------------------------------------------------------------


class Sam2Refiner:
    """Per-frame SAM2 refinement of the flow-error mask, seeded by
    connected-component centroids — the reference's seeding scheme
    (`monst3r_utils.py:651-680`: CCs >= min_area px -> one positive point
    prompt per object). Objects decode as one batch on one shared encoder
    pass; each component whose best multimask clears `iou_floor` is REPLACED
    by its SAM2 mask, while unprompted / rejected components keep their raw
    flow-error pixels (a moving object must never silently re-enter the
    static set just because the prompt budget ran out). Pairs with
    TemporalMaskPropagator for cross-frame carry.
    """

    def __init__(self, params, cfg: SAM2Config = SAM2_BASE_PLUS,
                 max_objects: int = 8, iou_floor: float = 0.3):
        self.params = params
        self.cfg = cfg
        self.max_objects = max_objects
        self.iou_floor = iou_floor

    def __call__(self, img_u8, err_norm, raw_mask, threshold, min_area):
        import cv2

        h, w = raw_mask.shape
        raw_mask = np.asarray(raw_mask, bool)
        n_lbl, labels, stats, cents = cv2.connectedComponentsWithStats(
            raw_mask.astype(np.uint8), connectivity=8
        )
        # component ids >= min_area, largest first (under a full prompt
        # budget the big movers matter most)
        comp = [
            (int(stats[i, cv2.CC_STAT_AREA]), i, cents[i])
            for i in range(1, n_lbl)
            if stats[i, cv2.CC_STAT_AREA] >= min_area
        ]
        comp.sort(reverse=True)
        if not comp:
            return raw_mask
        B = self.max_objects
        if len(comp) > B:
            print(
                f"Sam2Refiner: {len(comp)} components exceed the prompt "
                f"budget ({B}); the smallest {len(comp) - B} keep their raw "
                "flow-error pixels"
            )
        S = self.cfg.img_size
        img01 = cv2.resize(
            np.asarray(img_u8[..., :3], np.uint8), (S, S),
            interpolation=cv2.INTER_AREA,
        ).astype(np.float32) / 255.0
        # fixed-size object batch (static shapes): pad with not-a-point rows
        pts = np.zeros((B, 1, 2), np.float32)
        lbs = -np.ones((B, 1), np.int32)
        for i, (_, _, (cx, cy)) in enumerate(comp[:B]):
            pts[i, 0] = (cx / w, cy / h)
            lbs[i, 0] = 1
        img_emb, hr0, hr1 = sam2_encode(
            self.params, self.cfg, jnp.asarray(img01)[None]
        )
        sel, iou = sam2_decode_select(
            self.params, self.cfg, img_emb, hr0, hr1,
            jnp.asarray(pts), jnp.asarray(lbs),
        )
        sel = np.asarray(sel)  # (B, S/4, S/4) bool — small transfer
        iou = np.asarray(iou)
        out = raw_mask.copy()
        for i, (_, comp_id, _) in enumerate(comp[:B]):
            if iou[i] < self.iou_floor:
                continue  # rejected: the component keeps its raw pixels
            m = cv2.resize(
                sel[i].astype(np.uint8), (w, h),
                interpolation=cv2.INTER_NEAREST,
            ).astype(bool)
            out &= labels != comp_id  # replace this component...
            out |= m  # ...with its SAM2 segmentation
        return out


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _lin_p(key, ci, co):
    return {
        "w": math.sqrt(2.0 / ci) * jax.random.normal(key, (ci, co)),
        "b": jnp.zeros((co,)),
    }


def _ln_p(c):
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _cv_p(key, kh, kw, ci, co):
    return {
        "w": math.sqrt(2.0 / (kh * kw * ci)) * jax.random.normal(key, (kh, kw, ci, co)),
        "b": jnp.zeros((co,)),
    }


def _attn_p(key, c, kv_c=None, internal=None):
    """SAM attention params: q/k/v/out projections (internal dim may be
    downscaled, as in the decoder's cross-attention)."""
    kv_c = kv_c or c
    internal = internal or c
    ks = jax.random.split(key, 4)
    return {
        "q": _lin_p(ks[0], c, internal),
        "k": _lin_p(ks[1], kv_c, internal),
        "v": _lin_p(ks[2], kv_c, internal),
        "out": _lin_p(ks[3], internal, c),
    }


def init_sam2_params(key, cfg: SAM2Config = SAM2_BASE_PLUS):
    ks = iter(jax.random.split(key, 256))
    C = cfg.embed_dim
    d = cfg.d_model

    # trunk
    blocks = []
    dim = C
    stage_ends = np.cumsum(cfg.stages) - 1
    q_pool_blocks = set(int(e) + 1 for e in stage_ends[:-1])
    n_blocks = int(sum(cfg.stages))
    for i in range(n_blocks):
        dim_out = dim * 2 if i in q_pool_blocks else dim
        blk = {
            "norm1": _ln_p(dim),
            "attn": {
                "qkv": _lin_p(next(ks), dim, 3 * dim_out),
                "proj": _lin_p(next(ks), dim_out, dim_out),
            },
            "norm2": _ln_p(dim_out),
            "mlp": {
                "fc1": _lin_p(next(ks), dim_out, 4 * dim_out),
                "fc2": _lin_p(next(ks), 4 * dim_out, dim_out),
            },
        }
        if dim_out != dim:
            blk["proj"] = _lin_p(next(ks), dim, dim_out)
        blocks.append(blk)
        dim = dim_out
    bh, bw = cfg.window_pos_embed_bkg_spatial_size
    trunk = {
        "patch_embed": _cv_p(next(ks), 7, 7, 3, C),
        "pos_embed": 0.02 * jax.random.normal(next(ks), (1, bh, bw, C)),
        "pos_embed_window": 0.02
        * jax.random.normal(next(ks), (1, cfg.window_spec[0], cfg.window_spec[0], C)),
        "blocks": blocks,
    }

    # neck: 1x1 convs from each stage dim to d_model
    stage_dims = [C * 2**i for i in range(len(cfg.stages))]
    neck = {"convs": [ _cv_p(next(ks), 1, 1, sd, d) for sd in stage_dims ]}

    prompt = {
        "pe_gaussian": jax.random.normal(next(ks), (2, d // 2)),
        "point_neg": 0.02 * jax.random.normal(next(ks), (d,)),
        "point_pos": 0.02 * jax.random.normal(next(ks), (d,)),
        "not_a_point": 0.02 * jax.random.normal(next(ks), (d,)),
        "no_mask_embed": 0.02 * jax.random.normal(next(ks), (d,)),
    }

    def twoway_layer():
        return {
            "self_attn": _attn_p(next(ks), d),
            "norm1": _ln_p(d),
            "cross_t2i": _attn_p(next(ks), d, internal=d // 2),
            "norm2": _ln_p(d),
            "mlp": {
                "fc1": _lin_p(next(ks), d, cfg.dec_mlp_dim),
                "fc2": _lin_p(next(ks), cfg.dec_mlp_dim, d),
            },
            "norm3": _ln_p(d),
            "cross_i2t": _attn_p(next(ks), d, internal=d // 2),
            "norm4": _ln_p(d),
        }

    M = cfg.num_mask_tokens
    dec = {
        "iou_token": 0.02 * jax.random.normal(next(ks), (1, d)),
        "mask_tokens": 0.02 * jax.random.normal(next(ks), (M, d)),
        "obj_token": 0.02 * jax.random.normal(next(ks), (1, d)),
        "layers": [twoway_layer() for _ in range(cfg.dec_depth)],
        "final_t2i": _attn_p(next(ks), d, internal=d // 2),
        "norm_final": _ln_p(d),
        "up1": _cv_p(next(ks), 2, 2, d, d // 4),
        "up_norm": _ln_p(d // 4),
        "up2": _cv_p(next(ks), 2, 2, d // 4, d // 8),
        "skip0": _cv_p(next(ks), 1, 1, d, d // 8),
        "skip1": _cv_p(next(ks), 1, 1, d, d // 4),
        "hyper": [
            [
                _lin_p(next(ks), d, d),
                _lin_p(next(ks), d, d),
                _lin_p(next(ks), d, d // 8),
            ]
            for _ in range(M)
        ],
        "iou_head": [
            _lin_p(next(ks), d, d),
            _lin_p(next(ks), d, d),
            _lin_p(next(ks), d, M),
        ],
    }
    return {
        "trunk": trunk, "neck": neck, "prompt": prompt, "dec": dec,
        "no_mem_embed": 0.02 * jax.random.normal(next(ks), (1, 1, 1, d)),
    }


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (official sam2_hiera_*.pt)
# ---------------------------------------------------------------------------


def sam2_params_from_torch(path: str, cfg: SAM2Config = SAM2_BASE_PLUS):
    """Convert an official SAM2 checkpoint (facebookresearch/sam2,
    `sam2_hiera_base_plus.pt` etc. — state dict under "model") to the pytree
    consumed by `sam2_image_forward`.

    Memory-attention / memory-encoder weights (`memory_*`, `maskmem_*`) are
    intentionally dropped: temporal mask carry is handled by
    `TemporalMaskPropagator` (see module docstring).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in sd:
        sd = sd["model"]
    sd = {k: v.numpy() for k, v in sd.items()}

    def lin(name):
        return {"w": sd[f"{name}.weight"].T, "b": sd[f"{name}.bias"]}

    def ln(name):
        return {"w": sd[f"{name}.weight"], "b": sd[f"{name}.bias"]}

    def cv(name):
        # torch conv (O, I, kh, kw) -> HWIO
        p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
        if f"{name}.bias" in sd:
            p["b"] = sd[f"{name}.bias"]
        return p

    def cvt(name):
        # torch ConvTranspose2d (I, O, kh, kw) -> (kh, kw, I, O); the einsum
        # upsampler indexes w[di, dj] exactly as torch scatters x*W[:,:,di,dj]
        p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 0, 1))}
        if f"{name}.bias" in sd:
            p["b"] = sd[f"{name}.bias"]
        return p

    def attn(name):
        return {
            "q": lin(f"{name}.q_proj"),
            "k": lin(f"{name}.k_proj"),
            "v": lin(f"{name}.v_proj"),
            "out": lin(f"{name}.out_proj"),
        }

    tk = "image_encoder.trunk"
    n_blocks = int(sum(cfg.stages))
    stage_ends = np.cumsum(cfg.stages) - 1
    q_pool_blocks = set(int(e) + 1 for e in stage_ends[:-1])
    blocks = []
    for i in range(n_blocks):
        b = f"{tk}.blocks.{i}"
        blk = {
            "norm1": ln(f"{b}.norm1"),
            "attn": {"qkv": lin(f"{b}.attn.qkv"), "proj": lin(f"{b}.attn.proj")},
            "norm2": ln(f"{b}.norm2"),
            "mlp": {
                "fc1": lin(f"{b}.mlp.layers.0"),
                "fc2": lin(f"{b}.mlp.layers.1"),
            },
        }
        if i in q_pool_blocks:
            blk["proj"] = lin(f"{b}.proj")
        blocks.append(blk)
    trunk = {
        "patch_embed": cv(f"{tk}.patch_embed.proj"),
        # (1, C, h, w) -> (1, h, w, C)
        "pos_embed": np.ascontiguousarray(sd[f"{tk}.pos_embed"].transpose(0, 2, 3, 1)),
        "pos_embed_window": np.ascontiguousarray(
            sd[f"{tk}.pos_embed_window"].transpose(0, 2, 3, 1)
        ),
        "blocks": blocks,
    }

    # the checkpoint's neck convs are ordered DESCENDING (convs.0 consumes
    # the 1/32, widest feature — backbone_channel_list=[896, 448, 224, 112]);
    # neck_forward stores them ASCENDING to zip with the stage outputs
    n_lv = len(cfg.stages)
    neck = {
        "convs": [
            cv(f"image_encoder.neck.convs.{n_lv - 1 - i}.conv")
            for i in range(n_lv)
        ]
    }

    pk = "sam_prompt_encoder"
    prompt = {
        "pe_gaussian": sd[f"{pk}.pe_layer.positional_encoding_gaussian_matrix"],
        # point_embeddings: 0 = negative, 1 = positive (2/3 are box corners)
        "point_neg": sd[f"{pk}.point_embeddings.0.weight"][0],
        "point_pos": sd[f"{pk}.point_embeddings.1.weight"][0],
        "not_a_point": sd[f"{pk}.not_a_point_embed.weight"][0],
        "no_mask_embed": sd[f"{pk}.no_mask_embed.weight"][0],
    }

    dk = "sam_mask_decoder"
    M = cfg.num_mask_tokens
    layers = []
    for i in range(cfg.dec_depth):
        L = f"{dk}.transformer.layers.{i}"
        layers.append(
            {
                "self_attn": attn(f"{L}.self_attn"),
                "norm1": ln(f"{L}.norm1"),
                "cross_t2i": attn(f"{L}.cross_attn_token_to_image"),
                "norm2": ln(f"{L}.norm2"),
                "mlp": {
                    "fc1": lin(f"{L}.mlp.layers.0"),
                    "fc2": lin(f"{L}.mlp.layers.1"),
                },
                "norm3": ln(f"{L}.norm3"),
                "cross_i2t": attn(f"{L}.cross_attn_image_to_token"),
                "norm4": ln(f"{L}.norm4"),
            }
        )
    dec = {
        "iou_token": sd[f"{dk}.iou_token.weight"],
        "mask_tokens": sd[f"{dk}.mask_tokens.weight"],
        "obj_token": sd[f"{dk}.obj_score_token.weight"],
        "layers": layers,
        "final_t2i": attn(f"{dk}.transformer.final_attn_token_to_image"),
        "norm_final": ln(f"{dk}.transformer.norm_final_attn"),
        "up1": cvt(f"{dk}.output_upscaling.0"),
        "up_norm": ln(f"{dk}.output_upscaling.1"),
        "up2": cvt(f"{dk}.output_upscaling.3"),
        "skip0": cv(f"{dk}.conv_s0"),
        "skip1": cv(f"{dk}.conv_s1"),
        "hyper": [
            [lin(f"{dk}.output_hypernetworks_mlps.{m}.layers.{j}") for j in range(3)]
            for m in range(M)
        ],
        "iou_head": [
            lin(f"{dk}.iou_prediction_head.layers.{j}") for j in range(3)
        ],
    }
    params = {
        "trunk": trunk, "neck": neck, "prompt": prompt, "dec": dec,
        # (1, 1, d) in the checkpoint; broadcast over (B, H, W, d) here
        "no_mem_embed": sd["no_mem_embed"].reshape(1, 1, 1, -1),
    }
    return jax.tree.map(jnp.asarray, params)
