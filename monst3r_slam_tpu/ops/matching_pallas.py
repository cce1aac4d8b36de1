"""Pallas TPU kernel for the tiled matcher's hot loop.

Grid = (tiles, query-subblocks). For each 16x16 source tile:
  * rays (3ch) and descriptors (24ch) are packed into ONE 128-channel
    lane-aligned image; the tile's CROPxCROPx128 patch is DMA'd HBM->VMEM
    once (at subblock 0; the scratch persists across subblocks). Corners are
    quantized to the 8-sublane grid for Mosaic slice alignment;
  * each subblock scores `sub_q` query pixels against the patch with two
    full-K (128) NT matmuls on the MXU (zero gathers in the kernel) — the
    subblocking keeps every (sub_q, crop^2) f32 temporary ~1 MB so the whole
    working set stays within the 16 MB VMEM budget;
  * the descriptor refinement takes the EXACT argmax over the +-R window
    around the ray match (the reference's coarse-to-fine dilation,
    matching_kernels.cu:49-77, is a CUDA compute-saving heuristic; with the
    full score map on-chip the exact window max is strictly better);
  * subpixel peak values for the convergence test come from one-hot
    reductions over rolled score maps.

Outputs per source pixel: matched (u, v) int32 and the converged flag.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK = 128  # packed channel count (lane-aligned)


class PallasTileConfig(NamedTuple):
    tile: int = 16
    crop: int = 64
    window: int = 15  # refine search radius (= radius * dilation_max)
    sub_q: int = 64  # queries per grid step (VMEM bound)


def _kernel(
    corners_ref,  # scalar prefetch: (T, 2) int32 (x, y), 8-aligned
    img_hbm,  # (h, w, PACK) ANY — packed rays+desc
    q_rays_ref,  # (1, sub_q, PACK) VMEM block (desc channels zeroed)
    q_desc_ref,  # (1, sub_q, PACK) VMEM block (ray channels zeroed)
    u_out,  # (1, 1, sub_q) int32
    v_out,  # (1, 1, sub_q) int32
    conv_out,  # (1, 1, sub_q) int32
    crop_scr,  # VMEM scratch (crop, crop, PACK)
    sem,  # DMA semaphore
    *,
    crop: int,
    window: int,
    conv_thresh: float,
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    cx = corners_ref[t, 0]
    cy = corners_ref[t, 1]

    @pl.when(j == 0)
    def _fetch():
        dma = pltpu.make_async_copy(
            img_hbm.at[pl.ds(cy, crop), pl.ds(cx, crop), :], crop_scr, sem
        )
        dma.start()
        dma.wait()

    nq = q_rays_ref.shape[1]
    m = crop * crop
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, m), 1)

    patch = crop_scr[...].reshape(m, PACK)  # fold leading dims only

    q_rays = q_rays_ref[0]  # (nq, PACK)
    s_ray = jax.lax.dot_general(
        q_rays, patch, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (nq, m)

    best = jnp.argmax(s_ray, axis=-1)
    onehot = (col == best[:, None]).astype(jnp.float32)

    def at_best(scores):
        return jnp.sum(scores * onehot, axis=-1)

    s0 = at_best(s_ray)
    sxm = at_best(pltpu.roll(s_ray, 1, 1))
    sxp = at_best(pltpu.roll(s_ray, m - 1, 1))
    sym = at_best(pltpu.roll(s_ray, crop, 1))
    syp = at_best(pltpu.roll(s_ray, m - crop, 1))

    def gain(sm, sp):
        denom = 2.0 * s0 - sm - sp
        g = jnp.where(
            denom > 1e-12, (sp - sm) ** 2 / (8.0 * jnp.maximum(denom, 1e-12)), 0.0
        )
        return jnp.maximum(g, 0.0)

    peak = s0 + gain(sxm, sxp) + gain(sym, syp)
    conv_out[0, 0] = ((2.0 - 2.0 * peak) < conv_thresh).astype(jnp.int32)

    pu = best % crop
    pv = best // crop

    q_desc = q_desc_ref[0]
    s_desc = jax.lax.dot_general(
        q_desc, patch, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    du = col % crop - pu[:, None]
    dv = col // crop - pv[:, None]
    in_win = (jnp.abs(du) <= window) & (jnp.abs(dv) <= window)
    best_d = jnp.argmax(jnp.where(in_win, s_desc, -jnp.inf), axis=-1)

    u_out[0, 0] = cx + best_d % crop
    v_out[0, 0] = cy + best_d // crop


@functools.partial(jax.jit, static_argnames=("tcfg", "conv_thresh", "interpret"))
def tile_match_pallas(
    rays_img: jax.Array,  # (h, w, 3) unit rays of the target image
    desc_img: jax.Array,  # (h, w, fd), fd <= PACK-3
    q_rays: jax.Array,  # (T, tsz, 3) query unit rays per tile
    q_desc: jax.Array,  # (T, tsz, fd)
    corners: jax.Array,  # (T, 2) int32 crop corners (x, y); quantized to 8
    tcfg: PallasTileConfig = PallasTileConfig(),
    conv_thresh: float = 1e-6,
    interpret: bool = False,
):
    """Returns (u_abs, v_abs (T, tsz) int32, converged (T, tsz) bool)."""
    h, w, _ = rays_img.shape
    T, tsz, _ = q_rays.shape
    fd = desc_img.shape[-1]
    crop = tcfg.crop
    sub_q = min(tcfg.sub_q, tsz)
    n_sub = tsz // sub_q
    assert tsz % sub_q == 0
    assert fd + 3 <= PACK

    def pack(a, b):
        pad = PACK - a.shape[-1] - b.shape[-1]
        return jnp.concatenate(
            [a, b, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1
        )

    img = pack(rays_img, desc_img)  # (h, w, PACK)
    q_rays_p = pack(q_rays, jnp.zeros_like(q_desc)).reshape(T * n_sub, sub_q, PACK)
    q_desc_p = pack(jnp.zeros_like(q_rays), q_desc).reshape(T * n_sub, sub_q, PACK)

    corners = jnp.stack(
        [
            jnp.clip(corners[:, 0] & ~7, 0, w - crop),
            jnp.clip(corners[:, 1] & ~7, 0, h - crop),
        ],
        axis=-1,
    )

    kernel = functools.partial(
        _kernel, crop=crop, window=tcfg.window, conv_thresh=conv_thresh
    )

    # Query/output blocks live in a flat (T*n_sub) leading dim
    def qmap(i, j, c):
        return (i * n_sub + j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, n_sub),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, sub_q, PACK), qmap),
            pl.BlockSpec((1, sub_q, PACK), qmap),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, sub_q), qmap),
            pl.BlockSpec((1, 1, sub_q), qmap),
            pl.BlockSpec((1, 1, sub_q), qmap),
        ],
        scratch_shapes=[
            pltpu.VMEM((crop, crop, PACK), img.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    u, v, conv = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((T * n_sub, 1, sub_q), jnp.int32),
            jax.ShapeDtypeStruct((T * n_sub, 1, sub_q), jnp.int32),
            jax.ShapeDtypeStruct((T * n_sub, 1, sub_q), jnp.int32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(corners, img, q_rays_p, q_desc_p)
    return (
        u.reshape(T, tsz),
        v.reshape(T, tsz),
        conv.reshape(T, tsz).astype(jnp.bool_),
    )
