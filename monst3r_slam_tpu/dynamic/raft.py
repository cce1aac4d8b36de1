"""RAFT optical flow in JAX (Teed & Deng, ECCV 2020).

The reference pipeline runs RAFT with the Tartan checkpoint for the dynamic
mask (`tracker2.py:35-38`, 20 iterations at `monst3r_utils.py:554`); its
vendored module is empty in the snapshot, so this is a from-scratch JAX
implementation of the published architecture:

  * feature/context encoders: conv7x7/s2 + 6 residual blocks (1/8 res, 256ch)
  * all-pairs 4-level correlation pyramid with radius-4 bilinear lookup
  * SepConvGRU update block with motion encoder + flow head
  * convex 8x upsampling of the final flow

TPU notes: the correlation pyramid at 1/8 resolution is tiny
((h/8*w/8)^2 ~ 3072^2 at 512-res), so the all-pairs matmul is MXU-friendly;
the per-iteration lookup gathers touch only (hw/64)*81*4 values. Instance
norm runs in f32. `raft_params_from_torch` maps the standard torch RAFT
state-dict names for checkpoint conversion.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RAFTConfig(NamedTuple):
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 20


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def conv(p, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def instance_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if "w" in p:
        y = y * p["w"] + p["b"]
    return y.astype(x.dtype)


def res_block(p, x, stride=1):
    y = jax.nn.relu(instance_norm(p["norm1"], conv(p["conv1"], x, stride)))
    y = jax.nn.relu(instance_norm(p["norm2"], conv(p["conv2"], y)))
    if "downsample" in p:
        x = instance_norm(p["norm3"], conv(p["downsample"], x, stride))
    return jax.nn.relu(x + y)


def encoder(p, x):
    """BasicEncoder: 1/8 resolution features."""
    x = jax.nn.relu(instance_norm(p["norm1"], conv(p["conv1"], x, stride=2)))
    for i, blk in enumerate(p["layers"]):
        stride = 2 if (i in (2, 4)) else 1
        x = res_block(blk, x, stride)
    return conv(p["conv2"], x)


# ---------------------------------------------------------------------------
# Correlation pyramid
# ---------------------------------------------------------------------------


def corr_pyramid(f1, f2, levels):
    """f1/f2: (H, W, C) 1/8-res features -> list of (H*W, hl, wl) volumes."""
    h, w, c = f1.shape
    corr = jnp.einsum(
        "ic,jc->ij", f1.reshape(h * w, c), f2.reshape(h * w, c),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(c)
    corr = corr.reshape(h * w, h, w)
    pyr = [corr]
    for _ in range(levels - 1):
        hh, ww = pyr[-1].shape[1] // 2, pyr[-1].shape[2] // 2
        pooled = pyr[-1][:, : 2 * hh, : 2 * ww].reshape(h * w, hh, 2, ww, 2).mean((2, 4))
        pyr.append(pooled)
    return pyr


def _bilinear_lookup(vol, u, v):
    """vol: (N, hl, wl); u, v: (N, K) float coords -> (N, K)."""
    n, hl, wl = vol.shape
    flat = vol.reshape(n, hl * wl)
    u0 = jnp.clip(jnp.floor(u), 0, max(wl - 2, 0)).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, max(hl - 2, 0)).astype(jnp.int32)
    du = jnp.clip(u - u0, 0.0, 1.0)
    dv = jnp.clip(v - v0, 0.0, 1.0)
    base = u0 + wl * v0

    def tap(offset):
        idx = jnp.clip(base + offset, 0, hl * wl - 1)
        return jnp.take_along_axis(flat, idx, axis=1)

    s00, s01 = tap(0), tap(1)
    s10, s11 = tap(wl), tap(wl + 1)
    return (
        s00 * (1 - du) * (1 - dv) + s01 * du * (1 - dv)
        + s10 * (1 - du) * dv + s11 * du * dv
    )


def _bilinear_lookup_mm(vol, u, v):
    """Matmul-form bilinear sampling: vol (N, hl, wl); u, v (N, K) -> (N, K).

    TPU gathers cost ~10ns/element; the gather form of the RAFT lookup
    (4 taps x K offsets x N pixels x 4 levels every GRU iteration) dominated
    the whole flow computation (~56 ms/iter measured on v5e at 384x512).
    Separable bilinear interpolation is instead expressed as two small
    batched contractions with the interpolation weights baked into
    near-one-hot row/column matrices:

        out[n, k] = sum_{h,w} Wv[n, k, h] * vol[n, h, w] * Wu[n, k, w]

    where Wv has (1-dv) at v0 and dv at v0+1 (same for Wu). Both einsums map
    onto the MXU; the arithmetic is ~1000x the gather form's useful work but
    runs orders of magnitude faster than the serialized gathers.
    """
    n, hl, wl = vol.shape
    u0 = jnp.clip(jnp.floor(u), 0, max(wl - 2, 0))
    v0 = jnp.clip(jnp.floor(v), 0, max(hl - 2, 0))
    du = jnp.clip(u - u0, 0.0, 1.0)[..., None]
    dv = jnp.clip(v - v0, 0.0, 1.0)[..., None]
    rows = jax.lax.broadcasted_iota(jnp.float32, (1, 1, hl), 2)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, 1, wl), 2)
    v0 = v0[..., None]
    u0 = u0[..., None]
    Wv = jnp.where(rows == v0, 1.0 - dv, 0.0) + jnp.where(rows == v0 + 1, dv, 0.0)
    Wu = jnp.where(cols == u0, 1.0 - du, 0.0) + jnp.where(cols == u0 + 1, du, 0.0)
    # HIGHEST precision: this backend runs default-precision f32 einsums on
    # the MXU in bf16, which would round both the correlation volume and the
    # (1-dv, dv) interpolation weights every GRU iteration and diverge from
    # the f32 gather oracle (the CPU-backed parity test can't see that).
    # The contraction is tiny (~13 MFLOP/level), so exactness is free here.
    tmp = jnp.einsum(
        "nkh,nhw->nkw", Wv, vol, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.einsum(
        "nkw,nkw->nk", tmp, Wu, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _axis_weights(a, d, size):
    """One-hot-with-bilinear-weight matrix for ONE axis of the tap grid.

    a: (N,) float center coordinate along this axis; d: (K,) INTEGER tap
    offsets; size: axis length. Returns (N, K, size) where
    W[n, k, :] carries (1-frac) at clip(floor(a)+d[k]) and frac at +1 —
    exactly the per-tap clipping semantics of `_bilinear_lookup_mm`
    (floor(a + d) == floor(a) + d because d is integral).
    """
    base0 = jnp.floor(a)[:, None]  # (N, 1)
    i0 = jnp.clip(base0 + d[None, :], 0, max(size - 2, 0))  # (N, K)
    frac = jnp.clip(a[:, None] + d[None, :] - i0, 0.0, 1.0)[..., None]
    pos = jax.lax.broadcasted_iota(jnp.float32, (1, 1, size), 2)
    i0 = i0[..., None]
    return jnp.where(pos == i0, 1.0 - frac, 0.0) + jnp.where(
        pos == i0 + 1, frac, 0.0
    )


def _bilinear_lookup_sep(vol, cu, cv, d):
    """Separable tap-grid lookup: vol (N, hl, wl); cu/cv (N,) centers;
    d (K,) integer offsets -> (N, K*K) in (dv-major, du-minor) order.

    The RAFT tap grid is the outer product of K row offsets and K column
    offsets, so the (N, K^2, hl) one-hot weight matrices of
    `_bilinear_lookup_mm` contain only K distinct rows each. Factoring the
    taps into per-axis matrices cuts the materialized weight volume and the
    first contraction's FLOPs by K (=9 at radius 4):

        out[n, i, j] = sum_{h,w} Wv[n, i, h] * vol[n, h, w] * Wu[n, j, w]

    NEGATIVE RESULT on v5e at 384x512 (scripts/profile_raft_parts.py,
    scripts/profile_fused_flow.py): the lookup in isolation drops
    14.2 -> 9.9 ms over 20 iterations, but the FULL flow program gets
    slower (29.8 -> 34.1 ms raft_flow; 74.6 -> 82.0 ms fused host-to-host)
    — XLA fuses the 81-tap weight construction into the consuming
    contraction, while the factored form's (N, 9, 9) batched matmul
    (M=N=9 per MXU tile) and its layout into the motion-encoder convs cost
    more than the materialization it saves. Default stays off
    (_LOOKUP_SEP = False); kept with an exact-equivalence test for
    larger-radius/TPU-generation re-evaluation.
    """
    n, hl, wl = vol.shape
    Wv = _axis_weights(cv, d, hl)  # (N, K, hl)
    Wu = _axis_weights(cu, d, wl)  # (N, K, wl)
    tmp = jnp.einsum(
        "nih,nhw->niw", Wv, vol, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.einsum(
        "niw,njw->nij", tmp, Wu, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(n, -1)


# module-level default for the separable lookup (A/B toggle for profiling);
# False: measured slower end-to-end, see _bilinear_lookup_sep docstring
_LOOKUP_SEP = False


def corr_lookup(pyr, flow, radius, use_mm: bool = True, use_sep=None):
    """flow: (H, W, 2) current 1/8-res flow -> (H, W, levels*(2r+1)^2)."""
    if use_sep is None:
        use_sep = _LOOKUP_SEP
    h, w = flow.shape[:2]
    n = h * w
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(n)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(n)
    cx = gx + flow.reshape(n, 2)[:, 0]
    cy = gy + flow.reshape(n, 2)[:, 1]
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    du = jnp.tile(d, 2 * radius + 1)
    dv = jnp.repeat(d, 2 * radius + 1)
    lookup = _bilinear_lookup_mm if use_mm else _bilinear_lookup
    out = []
    for lvl, vol in enumerate(pyr):
        scale = 2.0**lvl
        if use_mm and use_sep:
            out.append(_bilinear_lookup_sep(vol, cx / scale, cy / scale, d))
            continue
        u = cx[:, None] / scale + du[None, :]
        v = cy[:, None] / scale + dv[None, :]
        out.append(lookup(vol, u, v))
    return jnp.concatenate(out, axis=-1).reshape(h, w, -1)


# ---------------------------------------------------------------------------
# Update block
# ---------------------------------------------------------------------------


def motion_encoder(p, flow, corr):
    c = jax.nn.relu(conv(p["convc1"], corr[None]))
    c = jax.nn.relu(conv(p["convc2"], c))
    f = jax.nn.relu(conv(p["convf1"], flow[None]))
    f = jax.nn.relu(conv(p["convf2"], f))
    m = jax.nn.relu(conv(p["conv"], jnp.concatenate([c, f], axis=-1)))
    return jnp.concatenate([m, flow[None]], axis=-1)


def sep_conv_gru(p, h, x):
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(conv(p["convz1"], hx))
    r = jax.nn.sigmoid(conv(p["convr1"], hx))
    q = jnp.tanh(conv(p["convq1"], jnp.concatenate([r * h, x], axis=-1)))
    h = (1 - z) * h + z * q
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(conv(p["convz2"], hx))
    r = jax.nn.sigmoid(conv(p["convr2"], hx))
    q = jnp.tanh(conv(p["convq2"], jnp.concatenate([r * h, x], axis=-1)))
    return (1 - z) * h + z * q


def flow_head(p, h):
    return conv(p["conv2"], jax.nn.relu(conv(p["conv1"], h)))


def convex_upsample(flow, mask, factor=8):
    """Convex combination 8x upsampling (RAFT's learned upsampler)."""
    h, w, _ = flow.shape
    mask = mask.reshape(h, w, 9, factor, factor)
    mask = jax.nn.softmax(mask, axis=2)
    # 3x3 neighborhood of the coarse flow
    fp = jnp.pad(flow * factor, ((1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [fp[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)], axis=2
    )  # (h, w, 9, 2)
    up = jnp.sum(mask[..., None] * neigh[:, :, :, None, None, :], axis=2)
    # (h, w, fy, fx, 2) -> (h*f, w*f, 2)
    return up.transpose(0, 2, 1, 3, 4).reshape(h * factor, w * factor, 2)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def raft_flow(params, img1, img2, cfg: RAFTConfig = RAFTConfig(),
              dtype=jnp.float32):
    """img1/img2: (H, W, 3) in [0, 255] -> flow (H, W, 2) at full res.

    H, W must be multiples of 8. Convs/GRU run in `dtype` (instance norms
    and the flow/correlation state always stay f32). f32 is the default:
    measured A/B on v5e (scripts/profile_raft_dtype.py) shows bf16 is NOT
    faster (21.0 ms f32 vs 23.0 ms bf16 — the backend already runs f32
    matmuls on the MXU in bf16) and drifts flow by ~3.5 px mean EPE.
    """
    x1 = ((img1[None] / 255.0) * 2.0 - 1.0).astype(dtype)
    x2 = ((img2[None] / 255.0) * 2.0 - 1.0).astype(dtype)
    f1 = encoder(params["fnet"], x1)[0]
    f2 = encoder(params["fnet"], x2)[0]
    ctx = encoder(params["cnet"], x1)[0]
    net = jnp.tanh(ctx[..., : cfg.hidden_dim])
    inp = jax.nn.relu(ctx[..., cfg.hidden_dim :])

    pyr = corr_pyramid(f1, f2, cfg.corr_levels)  # f32 accumulate
    h, w = f1.shape[:2]
    flow = jnp.zeros((h, w, 2))

    up = params["update"]

    def body(carry, _):
        net, flow = carry
        corr = corr_lookup(pyr, flow, cfg.corr_radius)
        motion = motion_encoder(
            up["encoder"], flow.astype(dtype), corr.astype(dtype)
        )
        x = jnp.concatenate([inp[None], motion], axis=-1)
        net_new = sep_conv_gru(up["gru"], net[None], x)[0]
        dflow = flow_head(up["flow_head"], net_new[None])[0]
        return (net_new, flow + dflow.astype(jnp.float32)), None

    (net, flow), _ = jax.lax.scan(body, (net, flow), None, length=cfg.iters)

    mask = conv(params["update"]["mask"]["conv2"],
                jax.nn.relu(conv(params["update"]["mask"]["conv1"], net[None])))[0]
    return convex_upsample(flow, mask.astype(jnp.float32) * 0.25)


# ---------------------------------------------------------------------------
# Init + torch conversion
# ---------------------------------------------------------------------------


def _conv_p(key, kh, kw, ci, co, bias=True):
    scale = math.sqrt(2.0 / (kh * kw * ci))
    p = {"w": scale * jax.random.normal(key, (kh, kw, ci, co))}
    if bias:
        p["b"] = jnp.zeros((co,))
    return p


def _in_p(c):
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,))}


def init_raft_params(key, cfg: RAFTConfig = RAFTConfig()):
    ks = iter(jax.random.split(key, 64))

    def enc(out_dim):
        dims = [(64, 64, 1), (64, 64, 1), (64, 96, 2), (96, 96, 1), (96, 128, 2), (128, 128, 1)]
        layers = []
        for ci, co, s in dims:
            blk = {
                "conv1": _conv_p(next(ks), 3, 3, ci, co),
                "norm1": _in_p(co),
                "conv2": _conv_p(next(ks), 3, 3, co, co),
                "norm2": _in_p(co),
            }
            if s > 1 or ci != co:
                blk["downsample"] = _conv_p(next(ks), 1, 1, ci, co)
                blk["norm3"] = _in_p(co)
            layers.append(blk)
        return {
            "conv1": _conv_p(next(ks), 7, 7, 3, 64),
            "norm1": _in_p(64),
            "layers": layers,
            "conv2": _conv_p(next(ks), 1, 1, 128, out_dim),
        }

    cor_planes = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    hd = cfg.hidden_dim
    update = {
        "encoder": {
            "convc1": _conv_p(next(ks), 1, 1, cor_planes, 256),
            "convc2": _conv_p(next(ks), 3, 3, 256, 192),
            "convf1": _conv_p(next(ks), 7, 7, 2, 128),
            "convf2": _conv_p(next(ks), 3, 3, 128, 64),
            "conv": _conv_p(next(ks), 3, 3, 256, 128 - 2),
        },
        "gru": {
            "convz1": _conv_p(next(ks), 1, 5, hd + 128 + cfg.context_dim, hd),
            "convr1": _conv_p(next(ks), 1, 5, hd + 128 + cfg.context_dim, hd),
            "convq1": _conv_p(next(ks), 1, 5, hd + 128 + cfg.context_dim, hd),
            "convz2": _conv_p(next(ks), 5, 1, hd + 128 + cfg.context_dim, hd),
            "convr2": _conv_p(next(ks), 5, 1, hd + 128 + cfg.context_dim, hd),
            "convq2": _conv_p(next(ks), 5, 1, hd + 128 + cfg.context_dim, hd),
        },
        "flow_head": {
            "conv1": _conv_p(next(ks), 3, 3, hd, 256),
            "conv2": _conv_p(next(ks), 3, 3, 256, 2),
        },
        "mask": {
            "conv1": _conv_p(next(ks), 3, 3, hd, 256),
            "conv2": _conv_p(next(ks), 1, 1, 256, 64 * 9),
        },
    }
    return {
        "fnet": enc(256),
        "cnet": enc(cfg.hidden_dim + cfg.context_dim),
        "update": update,
    }


def raft_params_from_torch(path: str):
    """Convert a standard torch RAFT checkpoint (fnet/cnet/update_block.*)."""
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in sd:
        sd = sd["model"]
    sd = {k.replace("module.", ""): v.numpy() for k, v in sd.items()}

    def cw(name):
        p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
        if f"{name}.bias" in sd:
            p["b"] = sd[f"{name}.bias"]
        return p

    def iw(name):
        if f"{name}.weight" in sd:
            return {"w": sd[f"{name}.weight"], "b": sd[f"{name}.bias"]}
        return {}

    def enc(pfx):
        layers = []
        for li, bi in ((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)):
            name = f"{pfx}.layer{li}.{bi}"
            blk = {
                "conv1": cw(f"{name}.conv1"), "norm1": iw(f"{name}.norm1"),
                "conv2": cw(f"{name}.conv2"), "norm2": iw(f"{name}.norm2"),
            }
            if f"{name}.downsample.0.weight" in sd:
                blk["downsample"] = cw(f"{name}.downsample.0")
                blk["norm3"] = iw(f"{name}.downsample.1")
            layers.append(blk)
        return {
            "conv1": cw(f"{pfx}.conv1"),
            "norm1": iw(f"{pfx}.norm1"),
            "layers": layers,
            "conv2": cw(f"{pfx}.conv2"),
        }

    params = {
        "fnet": enc("fnet"),
        "cnet": enc("cnet"),
        "update": {
            "encoder": {k: cw(f"update_block.encoder.{k}")
                        for k in ("convc1", "convc2", "convf1", "convf2", "conv")},
            "gru": {k: cw(f"update_block.gru.{k}")
                    for k in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2")},
            "flow_head": {
                "conv1": cw("update_block.flow_head.conv1"),
                "conv2": cw("update_block.flow_head.conv2"),
            },
            "mask": {
                "conv1": cw("update_block.mask.0"),
                "conv2": cw("update_block.mask.2"),
            },
        },
    }
    return jax.tree.map(jnp.asarray, params)


def make_raft_flow_estimator(params, cfg: RAFTConfig = RAFTConfig()):
    """Adapter for dynamic.mask.set_flow_estimator."""
    import numpy as np

    @jax.jit
    def prog(i8, j8):
        # u8 in, cast on device: the host->device image transfer is 4x
        # smaller than shipping f32 (relay transfers are latency-bound)
        return raft_flow(params, i8.astype(jnp.float32), j8.astype(jnp.float32), cfg)

    def estimator(img_i_u8, img_j_u8):
        return np.asarray(
            prog(jnp.asarray(img_i_u8, jnp.uint8), jnp.asarray(img_j_u8, jnp.uint8))
        )

    return estimator


def _to_255(img):
    """Trace-time dtype dispatch to RAFT's [0, 255] input domain.

    u8 images cast straight to f32. Float images are ImgNorm-normalized
    ([-1, 1], the tensor the encoder already consumed) and are mapped back
    with (x + 1) * 127.5 followed by round: for a u8-origin image the
    round cancels the f32 division rounding of the normalize, so the float
    path is BIT-EXACT to uploading the u8 (tests/test_raft.py). A leading
    batch dim is stripped in-program (free; a host-side [0] would cost a
    dispatch)."""
    if img.ndim == 4:
        img = img[0]
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32)
    return jnp.round((img.astype(jnp.float32) + 1.0) * 127.5)


def make_fused_flow_error_program(params, cfg: RAFTConfig = RAFTConfig(),
                                  out_u8: bool = True):
    """Adapter for dynamic.mask.set_flow_error_program: ONE jitted device
    program for RAFT flow + ego-motion flow + min-max-normalized error map,
    returning only the (h, w) error map to the host (one dispatch, one small
    transfer, instead of a dispatch chain per stage).

    Relay transfers dominated the host-to-host cost (74.6 ms measured vs
    29.8 ms for the 20-iteration flow compute alone, profile_fused_flow.py),
    so the adapter additionally:
      * accepts DEVICE-resident images — the pipeline passes the normalized
        frame tensor already uploaded for the encoder (zero extra upload);
      * caches the device copy of repeated host images by identity — the
        keyframe image recurs every frame until the next keyframe (entries
        pin their host array, so ids stay valid; callers must not mutate
        cached arrays in place);
      * returns the error map quantized to u8 (`out_u8`): the map is
        min-max normalized to [0, 1] and every consumer thresholds it
        (0.35 high / 0.45*0.35 low), so 1/255 steps are lossless in effect
        and the device->host transfer shrinks 4x.
    """
    import numpy as np

    from monst3r_slam_tpu.dynamic import mask as _mask

    @jax.jit
    def prog(img_i, img_j, T_i, T_j, depth_i, K):
        flow = raft_flow(params, _to_255(img_i), _to_255(img_j), cfg)
        ego = _mask.ego_motion_flow(T_i, T_j, depth_i, K)
        err = _mask.flow_error_map(flow, ego)
        if out_u8:
            return jnp.clip(jnp.round(err * 255.0), 0, 255).astype(jnp.uint8)
        return err

    dev_cache: dict = {}  # id -> (host array ref, device array)

    def to_device(img):
        if isinstance(img, jax.Array):
            return img  # batch dim (if any) is stripped in-program
        key = id(img)
        hit = dev_cache.get(key)
        if hit is not None and hit[0] is img:
            dev_cache[key] = dev_cache.pop(key)  # refresh LRU recency
            return hit[1]
        dev = jnp.asarray(img)
        if len(dev_cache) >= 4:  # tiny LRU: keyframe image + current frame
            dev_cache.pop(next(iter(dev_cache)))
        dev_cache[key] = (img, dev)
        return dev

    def adapter(img_i, img_j, T_WCi, T_WCj, depth_i, K, overlap_cb=None):
        # async dispatch: `dev` is a future; independent device work enqueued
        # via overlap_cb executes after the flow program while the host is
        # busy consuming the error map (hysteresis + GrabCut/SAM2 refine)
        dev = prog(
            to_device(img_i), to_device(img_j),
            jnp.asarray(T_WCi), jnp.asarray(T_WCj),
            jnp.asarray(depth_i), jnp.asarray(K),
        )
        if overlap_cb is not None:
            overlap_cb()
        err = np.asarray(dev)
        if out_u8:
            return err.astype(np.float32) / 255.0
        return err

    return adapter
