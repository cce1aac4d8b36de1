"""Pallas TPU kernel for the tiled matcher's hot loop.

Grid = one step per 16x16 source tile (query subblocks loop statically
inside the kernel). Per tile:
  * the target image is packed BF16 as [ray_hi(3) | desc(fd) | ray_mid(3) |
    ray_lo(3) | zeros] into one 128-lane image, where ray = hi + mid + lo is
    an exact three-term bf16 decomposition of the f32 unit ray (bit-level
    mantissa truncation — see `_split3`). The tile's CROPxCROPx128 patch
    streams HBM->VMEM through a DOUBLE-BUFFERED scratch: tile t computes
    while tile t+1's copy is in flight. Corners are quantized to the
    16-sublane-pair grid for Mosaic bf16 slice alignment;
  * ray scores: with query packings qB = [q_hi|0|q_hi|q_hi],
    qC = [q_mid|0|q_mid|0], qE = [q_lo|0|0|0],
    qB.p + qC.p + qE.p = q.r minus only O(2^-33) cross terms — a full
    f32-accurate dot from THREE single-pass bf16 MXU matmuls (measured dot
    error ~1e-7, well under the per-pixel score gap ~3e-6 AND the 1e-6
    convergence threshold), so both the argmax and the reference's
    convergence test (2 - 2*subpixel_peak < thresh,
    matching_kernels.cu:119-275) run entirely on-chip: the subpixel parabola
    comes from per-axis signed-mask reductions of the score map (no rolled
    copies, no gathers);
  * descriptor refinement: EXACT argmax over the +-R window around the ray
    match from one single-pass bf16 matmul — the reference itself refines
    descriptors in fp16 (matching.py:80-81), and its coarse-to-fine dilation
    (matching_kernels.cu:49-77) is a CUDA compute-saving heuristic; with the
    full score map on-chip the exact window max is strictly better.

4 MXU matmuls per (tile, subblock); score maps never touch HBM and the
caller needs no follow-up gathers (XLA image gathers at this match count
cost more than the whole kernel). 21.8 ms for 196k queries at 512x384 on
v5e vs 87 ms for the XLA tiled path, identical matches.

Outputs per source pixel: matched (u, v) int32 and the converged flag.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pack_width(fd: int) -> int:
    """Packed channel count. Always the full 128 lanes: Mosaic lane-pads the
    HBM memref to 128 regardless (`tpu.tiled<(8,128)...>` on the ANY-space
    image), so a narrower logical pack saves no HBM traffic, and a sub-128
    channel slice in the crop DMA is rejected ("slice shape along dim 2 must
    be aligned to tiling (128)")."""
    assert fd + 9 <= 128
    return 128


class PallasTileConfig(NamedTuple):
    tile: int = 16
    crop: int = 64
    window: int = 15  # refine search radius (= radius * dilation_max)
    sub_q: int = 128  # queries per grid step (fills MXU rows; VMEM bound)


def _trunc_bf16(x32):
    """f32 -> (bf16-representable f32 head, f32 tail), via bit masking.

    NOT `x - f32(bf16(x))`: under --xla_allow_excess_precision (set by
    default on this stack) XLA elides the f32->bf16->f32 round-trip, folding
    the tail to zero and silently degrading the split to single-pass bf16
    (~1e-3 dot error — 3 orders worse). The masked bitcast cannot be elided.
    """
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x32, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )
    return hi, x32 - hi


def _split3(x32):
    """Exact three-term bf16 decomposition: x ~= hi + mid + lo (err ~2^-25)."""
    hi, r1 = _trunc_bf16(x32)
    mid, r2 = _trunc_bf16(r1)
    return hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), r2.astype(jnp.bfloat16)


def _kernel(
    corners_ref,  # scalar prefetch: (T, 2) int32 (x, y), 16-aligned
    img_hbm,  # (h, w, PACK) bf16 ANY — packed [ray_hi | desc | ray_mid | ray_lo]
    qB_ref,  # (1, n_sub, sub_q, PACK) bf16 VMEM — [q_hi | 0 | q_hi | q_hi]
    qC_ref,  # (1, n_sub, sub_q, PACK) bf16 VMEM — [q_mid | 0 | q_mid | 0]
    qE_ref,  # (1, n_sub, sub_q, PACK) bf16 VMEM — [q_lo | 0 | 0 | 0]
    qD_ref,  # (1, n_sub, sub_q, PACK) bf16 VMEM — [0 | q_desc | 0 | 0]
    u_out,  # (1, n_sub, sub_q) int32
    v_out,  # (1, n_sub, sub_q) int32
    conv_out,  # (1, n_sub, sub_q) int32
    crop_scr,  # VMEM scratch (2, crop, crop, PACK) bf16 — double-buffered DMA target
    sem,  # DMA semaphore
    *,
    crop: int,
    window: int,
    conv_thresh: float,
):
    # One grid step per TILE; the (static) subblock loop runs inside so the
    # per-step Mosaic overhead is paid T times, not T*n_sub times. Crop DMAs
    # run through an NSLOT-deep rotating buffer: step t computes on slot
    # t%NSLOT while the DMAs for tiles t+1..t+NSLOT-1 stream into the other
    # slots. Depth 2 (classic double buffering) left the copies
    # latency-bound at ~50 GB/s effective (453 MB of 3x3-overlapping crops
    # = the kernel's dominant phase, scripts/profile_pallas_phases.py);
    # deeper pipelining keeps more DMA engines in flight.
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    nslot = crop_scr.shape[0]
    slot = jax.lax.rem(t, nslot)

    def start_fetch(tile_idx, slot_idx):
        # multiple_of: Mosaic can't prove the runtime corner is tile-aligned
        # on its own; the host quantizes corners to 16 (bf16 sublane pairs).
        cx_ = pl.multiple_of(corners_ref[tile_idx, 0], 16)
        cy_ = pl.multiple_of(corners_ref[tile_idx, 1], 16)
        pltpu.make_async_copy(
            img_hbm.at[pl.ds(cy_, crop), pl.ds(cx_, crop), :],
            crop_scr.at[slot_idx],
            sem.at[slot_idx],
        ).start()

    @pl.when(t == 0)
    def _first():
        start_fetch(0, 0)

    # Fill the pipeline: on step 0 also start tiles 1..nslot-2; every step
    # tops it up with tile t+nslot-1.
    for d in range(1, nslot - 1):

        @pl.when((t == 0) & (d < n_tiles))
        def _fill(d=d):
            start_fetch(d, d % nslot)

    @pl.when(t + nslot - 1 < n_tiles)
    def _prefetch():
        start_fetch(t + nslot - 1, jax.lax.rem(t + nslot - 1, nslot))

    cx = pl.multiple_of(corners_ref[t, 0], 16)
    cy = pl.multiple_of(corners_ref[t, 1], 16)
    pltpu.make_async_copy(
        img_hbm.at[pl.ds(cy, crop), pl.ds(cx, crop), :],
        crop_scr.at[slot],
        sem.at[slot],
    ).wait()

    n_sub = qB_ref.shape[1]
    nq = qB_ref.shape[2]
    pack = qB_ref.shape[3]
    m = crop * crop
    patch = crop_scr[slot].reshape(m, pack)
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, m), 1)

    def nt(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    for j in range(n_sub):
        s_ray = (
            nt(qB_ref[0, j], patch)
            + nt(qC_ref[0, j], patch)
            + nt(qE_ref[0, j], patch)
        )
        best = jnp.argmax(s_ray, axis=-1)  # (nq,)
        s0 = jnp.max(s_ray, axis=-1)

        # 5-point stencil around the peak (x neighbors +-1 flat index, y
        # neighbors +-crop; border peaks pick up a wrapped far pixel, which
        # only deflates the fitted peak -> conservative convergence). The
        # parabola gain needs only (sp - sm) and (sp + sm) per axis, so each
        # axis costs ONE signed-mask reduction and one masked reduction — no
        # rolled copies of the 2 MB score map.
        def pair_sums(d, best=best, s_ray=s_ray):
            at_p = col == (best[:, None] + d)
            at_m = col == (best[:, None] - d)
            sgn = jnp.where(at_p, 1.0, 0.0) - jnp.where(at_m, 1.0, 0.0)
            mag = jnp.where(at_p | at_m, s_ray, 0.0)
            diff = jnp.sum(s_ray * sgn, axis=-1)  # sp - sm
            tot = jnp.sum(mag, axis=-1)  # sp + sm
            return diff, tot

        dx, tx = pair_sums(1)
        dy, ty = pair_sums(crop)

        def gain(diff, tot, s0=s0):
            denom = 2.0 * s0 - tot
            g = jnp.where(
                denom > 1e-12, diff * diff / (8.0 * jnp.maximum(denom, 1e-12)), 0.0
            )
            return jnp.maximum(g, 0.0)

        peak = s0 + gain(dx, tx) + gain(dy, ty)
        conv_out[0, j] = ((2.0 - 2.0 * peak) < conv_thresh).astype(jnp.int32)

        pu = best % crop
        pv = best // crop

        s_desc = nt(qD_ref[0, j], patch)
        du = col % crop - pu[:, None]
        dv = col // crop - pv[:, None]
        in_win = (jnp.abs(du) <= window) & (jnp.abs(dv) <= window)
        best_d = jnp.argmax(jnp.where(in_win, s_desc, -jnp.inf), axis=-1)

        u_out[0, j] = cx + best_d % crop
        v_out[0, j] = cy + best_d // crop


@functools.partial(jax.jit, static_argnames=("tcfg", "conv_thresh", "interpret"))
def tile_match_pallas(
    rays_img: jax.Array,  # (h, w, 3) unit rays of the target image, f32
    desc_img: jax.Array,  # (h, w, fd)
    q_rays: jax.Array,  # (T, tsz, 3) query unit rays per tile, f32
    q_desc: jax.Array,  # (T, tsz, fd)
    corners: jax.Array,  # (T, 2) int32 crop corners (x, y)
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
    PACK = _pack_width(fd)

    bf = jnp.bfloat16

    def pack4(a, desc_part, b, c):
        pad = PACK - 9 - fd
        zeros = jnp.zeros(a.shape[:-1] + (pad,), bf)
        return jnp.concatenate(
            [a.astype(bf), desc_part.astype(bf), b.astype(bf), c.astype(bf), zeros],
            axis=-1,
        )

    r_hi, r_mid, r_lo = _split3(rays_img)
    img = pack4(r_hi, desc_img, r_mid, r_lo)  # (h, w, PACK) bf16

    q_hi, q_mid, q_lo = _split3(q_rays)
    zq = jnp.zeros_like(q_desc)
    zr = jnp.zeros_like(q_rays)
    qB = pack4(q_hi, zq, q_hi, q_hi).reshape(T, n_sub, sub_q, PACK)
    qC = pack4(q_mid, zq, q_mid, zr).reshape(T, n_sub, sub_q, PACK)
    qE = pack4(q_lo, zq, zr, zr).reshape(T, n_sub, sub_q, PACK)
    qD = pack4(zr, q_desc, zr, zr).reshape(T, n_sub, sub_q, PACK)

    corners = jnp.stack(
        [
            jnp.clip(corners[:, 0], 0, w - crop) & ~15,
            jnp.clip(corners[:, 1], 0, h - crop) & ~15,
        ],
        axis=-1,
    )

    kernel = functools.partial(
        _kernel, crop=crop, window=tcfg.window, conv_thresh=conv_thresh
    )

    def qmap(i, c):
        return (i, 0, 0, 0)

    def omap(i, c):
        return (i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n_sub, sub_q, PACK), qmap),
            pl.BlockSpec((1, n_sub, sub_q, PACK), qmap),
            pl.BlockSpec((1, n_sub, sub_q, PACK), qmap),
            pl.BlockSpec((1, n_sub, sub_q, PACK), qmap),
        ],
        out_specs=[
            pl.BlockSpec((1, n_sub, sub_q), omap),
            pl.BlockSpec((1, n_sub, sub_q), omap),
            pl.BlockSpec((1, n_sub, sub_q), omap),
        ],
        scratch_shapes=[
            # 4-deep rotating crop buffers (~2.4 MB VMEM at crop 48): keeps
            # 3 crop DMAs in flight — depth 2 measured latency-bound.
            pltpu.VMEM((4, crop, crop, PACK), bf),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    u, v, conv = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((T, n_sub, sub_q), jnp.int32),
            jax.ShapeDtypeStruct((T, n_sub, sub_q), jnp.int32),
            jax.ShapeDtypeStruct((T, n_sub, sub_q), jnp.int32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(corners, img, qB, qC, qE, qD)
    return (
        u.reshape(T, tsz),
        v.reshape(T, tsz),
        conv.reshape(T, tsz).astype(jnp.bool_),
    )
