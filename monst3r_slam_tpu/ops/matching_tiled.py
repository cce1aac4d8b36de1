"""Tiled MXU-native dense matcher.

TPU-first redesign of the matching kernels (reference CUDA
`matching_kernels.cu` iter_proj + refine_matches). The reference's per-pixel
Levenberg-Marquardt and windowed descriptor search are gather-bound — the
worst access pattern for TPU. This module recasts both as **batched local
correlations** that run on the MXU:

  1. (cold start only) GLOBAL coarse search: every query ray is scored
     against a stride-8 downsample of the target ray image with one batched
     matmul — full-image association, strictly wider search than the
     reference's local LM.
  2. Queries are grouped into 16x16 tiles of the source grid; each tile
     extracts one CROPxCROP patch of the target image centered on the tile's
     median initial/coarse match (contiguous `dynamic_slice`, no gathers).
  3. Ray association: argmax of query-ray x patch-ray dot products
     (einsum on the MXU) + quadratic subpixel fit for the convergence test
     against `convergence_thresh` (matching the reference's cost semantics:
     cost = |r_q - r_match|^2 = 2 - 2*dot for unit rays).
  4. Descriptor refinement: the same coarse-to-fine dilated-window argmax as
     refine_matches (radius 3, dilations 5..1), evaluated by masking the
     full patch score map instead of gathering window taps.

Degradation vs the reference: matches are constrained to the tile's crop
(default +-24 px around the tile median); pixels whose true match falls
outside (incoherent neighborhoods, typically occlusions) lose to the in-crop
argmax and are then rejected by the 3D-distance gate in `match()`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.ops.matching import MatchingConfig, lin_to_pixel, pixel_to_lin


class TiledConfig(NamedTuple):
    tile: int = 16  # source-grid tile (patch-size aligned)
    # Target crop per tile (>= 2*(radius*dilation_max) + spread). Crop DMA is
    # the matcher's dominant phase and scales with crop^2; 48 matches 64's
    # validity bit-for-bit on the ablation scenes (scripts/profile_crop.py:
    # 20.4 -> 16.5 ms) while 32 loses warm-start coverage and degrades.
    crop: int = 48
    coarse_stride: int = 8
    chunk_tiles: int = 64  # tiles per scan step (memory bound)
    # Warm-start fallback: when a tile's warm-start median disagrees with the
    # global coarse search by more than crop/2 - reseed_margin (stale init —
    # fast motion beyond the crop), the crop re-centers on the coarse result.
    # The reference's per-pixel LM (matching_kernels.cu:119-275) has no such
    # failure mode only because its cold path is seeded identically each call;
    # this keeps the tiled matcher's warm path equally unconditional.
    reseed_margin: int = 8


def _normalize(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _coarse_search(rays_img: jax.Array, queries: jax.Array, stride: int):
    """Full-image stride-`stride` ray association.

    rays_img: (h, w, 3); queries: (n, 3) unit rays.
    Returns (n, 2) float pixel positions at stride resolution.
    """
    h, w, _ = rays_img.shape
    coarse = _normalize(rays_img[stride // 2 :: stride, stride // 2 :: stride])
    ch, cw = coarse.shape[:2]
    flat = coarse.reshape(ch * cw, 3)

    def score_chunk(q):
        s = jnp.einsum("nf,mf->nm", q, flat, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGH)
        best = jnp.argmax(s, axis=-1)
        return best

    n = queries.shape[0]
    chunk = 32768
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    q = jnp.pad(queries, ((0, pad), (0, 0))) if pad else queries
    best = jax.lax.map(score_chunk, q.reshape(n_chunks, chunk, 3)).reshape(-1)[:n]
    u = (best % cw) * stride + stride // 2
    v = (best // cw) * stride + stride // 2
    return jnp.stack([u, v], axis=-1).astype(jnp.float32)


def _tile_queries(x: jax.Array, h: int, w: int, tile: int):
    """(h*w, c) row-major grid values -> (n_tiles, tile*tile, c)."""
    c = x.shape[-1]
    x = x.reshape(h // tile, tile, w // tile, tile, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(-1, tile * tile, c)


def _untile(x: jax.Array, h: int, w: int, tile: int):
    """(n_tiles, tile*tile, c) -> (h*w, c) row-major."""
    c = x.shape[-1]
    x = x.reshape(h // tile, w // tile, tile, tile, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(h * w, c)


def _extract_crops(img: jax.Array, corners: jax.Array, crop: int):
    """img (h, w, c); corners (T, 2) int32 (x, y) -> (T, crop, crop, c)."""

    def one(corner):
        return jax.lax.dynamic_slice(
            img, (corner[1], corner[0], jnp.zeros((), jnp.int32)),
            (crop, crop, img.shape[-1]),
        )

    return jax.vmap(one)(corners)


def _subpixel_peak(scores: jax.Array, best: jax.Array, crop: int):
    """1D quadratic fit of the score peak along x and y.

    scores: (..., crop*crop); best: (...,) flat argmax. Returns refined peak
    value (...,) — used only for the convergence test.
    """
    bx = best % crop
    by = best // crop

    def grab(dx, dy):
        idx = jnp.clip(bx + dx, 0, crop - 1) + crop * jnp.clip(by + dy, 0, crop - 1)
        return jnp.take_along_axis(scores, idx[..., None], axis=-1)[..., 0]

    s0 = grab(0, 0)
    sxm, sxp = grab(-1, 0), grab(1, 0)
    sym, syp = grab(0, -1), grab(0, 1)

    def peak_gain(sm, sp, s0):
        denom = 2 * s0 - sm - sp
        gain = jnp.where(denom > 1e-12, (sp - sm) ** 2 / (8 * jnp.maximum(denom, 1e-12)), 0.0)
        return jnp.maximum(gain, 0.0)

    return s0 + peak_gain(sxm, sxp, s0) + peak_gain(sym, syp, s0)


@partial(jax.jit, static_argnames=("cfg", "tcfg", "use_init", "use_pallas"))
def match_tiled(
    X11: jax.Array,  # (1, h, w, 3) target pointmap (frame i)
    X21: jax.Array,  # (1, h, w, 3) query pointmap (frame j, in i's frame)
    D11: jax.Array,  # (1, h, w, fd) target descriptors
    D21: jax.Array,  # (1, h, w, fd) query descriptors
    idx_1_to_2_init: Optional[jax.Array],  # (1, h*w) or None
    cfg: MatchingConfig = MatchingConfig(),
    tcfg: TiledConfig = TiledConfig(),
    use_init: bool = False,
    use_pallas: bool = False,
    warm_valid: Optional[jax.Array] = None,
):
    """Batched (b=1 per call; vmap for more) tiled matcher.

    `warm_valid` (optional () bool, TRACED) gates the warm start at run
    time: when False the coarse-search result is used even though
    `use_init=True` compiled the warm path in. The chunked tracker scans
    frames inside ONE program and the first frame after a keyframe switch
    has no valid warm start — a static `use_init` can't express that
    without a second compile of the whole chunk program.

    Returns (idx_1_to_2 (1, h*w) int32, valid (1, h*w, 1) bool).
    """
    h, w = X11.shape[1:3]
    hw = h * w
    tile = tcfg.tile
    crop = min(tcfg.crop, h, w)  # small images: crop can't exceed the frame
    n_tiles = (h // tile) * (w // tile)
    tsz = tile * tile

    rays_img = _normalize(X11[0])  # (h, w, 3)
    queries = _normalize(X21[0].reshape(hw, 3))

    # --- initial positions: warm start or global coarse search. The coarse
    # search always runs so stale warm starts can be detected and re-seeded
    # per tile; since only the per-tile MEDIAN is consumed, it scores a 1/4
    # subsample of each tile's queries (the full-density version materializes
    # a ~2.4 GB score map — ~6 ms of pure HBM traffic for medians that a
    # 64-sample subset reproduces).
    q_tiles = _tile_queries(queries, h, w, tile)  # (T, tsz, 3)
    sub = 4
    q_sub = q_tiles[:, ::sub].reshape(-1, 3)
    p_sub = _coarse_search(rays_img, q_sub, tcfg.coarse_stride)
    med_coarse = jnp.median(p_sub.reshape(n_tiles, -1, 2), axis=1)  # (T, 2)
    if use_init and idx_1_to_2_init is not None:
        p_init = lin_to_pixel(idx_1_to_2_init[0], w).astype(jnp.float32)
        med_warm = jnp.median(_tile_queries(p_init, h, w, tile), axis=1)
        # If the coarse estimate falls outside the warm crop, the warm start
        # cannot contain the true match — re-center that tile on coarse.
        stale = jnp.max(jnp.abs(med_warm - med_coarse), axis=-1) > (
            crop // 2 - tcfg.reseed_margin
        )
        med = jnp.where(stale[:, None], med_coarse, med_warm)
        if warm_valid is not None:
            med = jnp.where(warm_valid, med, med_coarse)
    else:
        med = med_coarse
    cx = jnp.clip(jnp.round(med[:, 0]).astype(jnp.int32) - crop // 2, 0, w - crop)
    cy = jnp.clip(jnp.round(med[:, 1]).astype(jnp.int32) - crop // 2, 0, h - crop)
    corners = jnp.stack([cx, cy], axis=-1)  # (T, 2) (x, y)

    q_rays = q_tiles  # (T, tsz, 3)
    q_desc = _tile_queries(D21[0].reshape(hw, -1), h, w, tile)  # (T, tsz, fd)

    # offsets within crop
    ox = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 1).reshape(-1)
    oy = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 0).reshape(-1)

    r = cfg.radius

    def process_chunk(args):
        corners_c, q_rays_c, q_desc_c = args
        ray_crops = _extract_crops(rays_img, corners_c, crop)  # (tc, c, c, 3)
        desc_crops = _extract_crops(D11[0], corners_c, crop)  # (tc, c, c, fd)
        tc = corners_c.shape[0]
        rc = ray_crops.reshape(tc, crop * crop, 3)
        dc = desc_crops.reshape(tc, crop * crop, -1)

        # 1. ray association (argmax over the crop). HIGHEST: the 2-2*dot
        # convergence test needs ~1e-7 dot accuracy and this backend silently
        # degrades HIGH f32 matmuls to bf16.
        s_ray = jnp.einsum(
            "tpf,tmf->tpm", q_rays_c, rc, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        best = jnp.argmax(s_ray, axis=-1)  # (tc, tsz)
        peak = _subpixel_peak(s_ray, best, crop)
        cost = 2.0 - 2.0 * peak
        converged = cost < cfg.convergence_thresh

        pu = best % crop
        pv = best // crop

        # 2. dilated-window descriptor refinement on the SAME crop
        s_desc = jnp.einsum(
            "tpf,tmf->tpm", q_desc_c, dc, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH,
        )
        for d in range(cfg.dilation_max, 0, -1):
            du = ox[None, None, :] - pu[..., None]
            dv = oy[None, None, :] - pv[..., None]
            rd = r * d
            in_window = (
                (jnp.abs(du) <= rd) & (jnp.abs(dv) <= rd)
                & (du % d == 0) & (dv % d == 0)
            )
            masked = jnp.where(in_window, s_desc, -jnp.inf)
            best_d = jnp.argmax(masked, axis=-1)
            pu = best_d % crop
            pv = best_d // crop

        u_abs = corners_c[:, None, 0] + pu
        v_abs = corners_c[:, None, 1] + pv
        return u_abs, v_abs, converged

    if use_pallas:
        # On-chip kernel: packed 128-ch crops DMA'd to VMEM, NT matmuls on
        # the MXU, exact window-argmax refinement, and the convergence test
        # from a three-term bf16-split score map (~1e-7 dot accuracy) — no
        # follow-up host-side gathers (ops/matching_pallas.py).
        from monst3r_slam_tpu.ops.matching_pallas import (
            PallasTileConfig,
            tile_match_pallas,
        )

        u_abs, v_abs, conv = tile_match_pallas(
            rays_img, D11[0], q_rays, q_desc, corners,
            tcfg=PallasTileConfig(
                tile=tile, crop=crop, window=cfg.radius * cfg.dilation_max,
                sub_q=min(128, tsz),
            ),
            conv_thresh=cfg.convergence_thresh,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        # chunk tiles through lax.map to bound score-map memory
        chunk = min(tcfg.chunk_tiles, n_tiles)
        n_chunks = -(-n_tiles // chunk)
        pad = n_chunks * chunk - n_tiles

        def padt(x):
            return jnp.concatenate([x, x[:pad]], axis=0) if pad else x

        u_abs, v_abs, conv = jax.lax.map(
            process_chunk,
            (
                padt(corners).reshape(n_chunks, chunk, 2),
                padt(q_rays).reshape(n_chunks, chunk, tsz, 3),
                padt(q_desc).reshape(n_chunks, chunk, tsz, -1),
            ),
        )
        u_abs = u_abs.reshape(-1, tsz)[:n_tiles]
        v_abs = v_abs.reshape(-1, tsz)[:n_tiles]
        conv = conv.reshape(-1, tsz)[:n_tiles]

    p = jnp.stack([u_abs, v_abs], axis=-1)  # (T, tsz, 2)
    p_flat = _untile(p.astype(jnp.int32), h, w, tile)  # (hw, 2)
    conv_flat = _untile(conv[..., None], h, w, tile)[:, 0]

    # occlusion gate (matching.py:71-76)
    lin = pixel_to_lin(p_flat, w)
    gathered = X11[0].reshape(hw, 3)[lin]
    dists = jnp.linalg.norm(gathered - X21[0].reshape(hw, 3), axis=-1)
    valid = conv_flat & (dists < cfg.dist_thresh)

    return lin[None], valid[None, :, None]


def match(X11, X21, D11, D21, idx_1_to_2_init=None,
          cfg: MatchingConfig = MatchingConfig(), tcfg: TiledConfig = TiledConfig(),
          use_pallas: bool = False):
    """Drop-in replacement for ops.matching.match using the tiled matcher.

    Handles batch dim by looping the single-image kernel (the Pallas path
    cannot be vmapped; b is 1 for tracking and small for graph edges).
    """
    b = X11.shape[0]
    use_init = idx_1_to_2_init is not None
    if not use_init:
        idx_1_to_2_init = jnp.zeros((b, X11.shape[1] * X11.shape[2]), jnp.int32)

    def one(x11, x21, d11, d21, idx0):
        return match_tiled(
            x11[None], x21[None], d11[None], d21[None], idx0[None],
            cfg=cfg, tcfg=tcfg, use_init=use_init, use_pallas=use_pallas,
        )

    if use_pallas:
        outs = [one(X11[k], X21[k], D11[k], D21[k], idx_1_to_2_init[k])
                for k in range(b)]
        idx = jnp.concatenate([o[0] for o in outs])
        valid = jnp.concatenate([o[1] for o in outs])
        return idx, valid

    idx, valid = jax.vmap(one)(X11, X21, D11, D21, idx_1_to_2_init)
    return idx[:, 0], valid[:, 0]
