#!/usr/bin/env python
"""Phase ablation of the production Pallas matcher kernel.

Variants build successive subsets of the real kernel on the real wrapper
data (same packing, DMA, grid): dma | ray (3 matmuls + argmax) | stencil
(+5-pt subpixel convergence) | full (+desc window refine).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_timeit import chain_time

from monst3r_slam_tpu.ops.matching_pallas import _pack_width, _split3
PACK = _pack_width(24)


def make_kernel(variant, crop, window, conv_thresh):
    def _kernel(corners_ref, img_hbm, qB_ref, qC_ref, qE_ref, qD_ref,
                u_out, v_out, conv_out, crop_scr, sem):
        t = pl.program_id(0)
        j = pl.program_id(1)
        cx = pl.multiple_of(corners_ref[t, 0], 16)
        cy = pl.multiple_of(corners_ref[t, 1], 16)

        @pl.when(j == 0)
        def _fetch():
            dma = pltpu.make_async_copy(
                img_hbm.at[pl.ds(cy, crop), pl.ds(cx, crop), :], crop_scr, sem)
            dma.start()
            dma.wait()

        nq = qB_ref.shape[1]
        m = crop * crop
        if variant == "dma":
            u_out[0, 0] = cx + jnp.zeros((nq,), jnp.int32)
            v_out[0, 0] = cy + jnp.zeros((nq,), jnp.int32)
            conv_out[0, 0] = jnp.zeros((nq,), jnp.int32)
            return
        patch = crop_scr[...].reshape(m, PACK)

        def nt(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        s_ray = nt(qB_ref[0], patch) + nt(qC_ref[0], patch) + nt(qE_ref[0], patch)
        best = jnp.argmax(s_ray, axis=-1)
        pu = best % crop
        pv = best // crop
        if variant == "ray":
            u_out[0, 0] = cx + pu
            v_out[0, 0] = cy + pv
            conv_out[0, 0] = jnp.zeros((nq,), jnp.int32)
            return

        col = jax.lax.broadcasted_iota(jnp.int32, (nq, m), 1)
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
            g = jnp.where(denom > 1e-12,
                          (sp - sm) ** 2 / (8.0 * jnp.maximum(denom, 1e-12)), 0.0)
            return jnp.maximum(g, 0.0)

        peak = s0 + gain(sxm, sxp) + gain(sym, syp)
        conv_out[0, 0] = ((2.0 - 2.0 * peak) < conv_thresh).astype(jnp.int32)
        if variant == "stencil":
            u_out[0, 0] = cx + pu
            v_out[0, 0] = cy + pv
            return

        s_desc = nt(qD_ref[0], patch)
        du = col % crop - pu[:, None]
        dv = col // crop - pv[:, None]
        in_win = (jnp.abs(du) <= window) & (jnp.abs(dv) <= window)
        best_d = jnp.argmax(jnp.where(in_win, s_desc, -jnp.inf), axis=-1)
        u_out[0, 0] = cx + best_d % crop
        v_out[0, 0] = cy + best_d // crop

    return _kernel


@functools.partial(jax.jit, static_argnames=("variant", "crop", "window", "sub_q"))
def run_variant(rays_img, desc_img, q_rays, q_desc, corners,
                variant, crop, window, sub_q):
    h, w, _ = rays_img.shape
    T, tsz, _ = q_rays.shape
    fd = desc_img.shape[-1]
    n_sub = tsz // sub_q
    bf = jnp.bfloat16

    def pack4(a, d, b, c):
        pad = PACK - 9 - fd
        return jnp.concatenate(
            [a.astype(bf), d.astype(bf), b.astype(bf), c.astype(bf),
             jnp.zeros(a.shape[:-1] + (pad,), bf)], axis=-1)

    r_hi, r_mid, r_lo = _split3(rays_img)
    img = pack4(r_hi, desc_img, r_mid, r_lo)
    q_hi, q_mid, q_lo = _split3(q_rays)
    zq = jnp.zeros_like(q_desc)
    zr = jnp.zeros_like(q_rays)
    qB = pack4(q_hi, zq, q_hi, q_hi).reshape(T * n_sub, sub_q, PACK)
    qC = pack4(q_mid, zq, q_mid, zr).reshape(T * n_sub, sub_q, PACK)
    qE = pack4(q_lo, zq, zr, zr).reshape(T * n_sub, sub_q, PACK)
    qD = pack4(zr, q_desc, zr, zr).reshape(T * n_sub, sub_q, PACK)
    corners = jnp.stack([jnp.clip(corners[:, 0], 0, w - crop) & ~15,
                         jnp.clip(corners[:, 1], 0, h - crop) & ~15], -1)

    def qmap(i, j, c):
        return (i * n_sub + j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, n_sub),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec((1, sub_q, PACK), qmap)] * 4,
        out_specs=[pl.BlockSpec((1, 1, sub_q), qmap)] * 3,
        scratch_shapes=[pltpu.VMEM((crop, crop, PACK), bf),
                        pltpu.SemaphoreType.DMA(())],
    )
    u, v, conv = pl.pallas_call(
        make_kernel(variant, crop, window, 1e-6),
        out_shape=[jax.ShapeDtypeStruct((T * n_sub, 1, sub_q), jnp.int32)] * 3,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(corners, img, qB, qC, qE, qD)
    return u


def main():
    h, w = 384, 512
    tile, crop, window, sub_q = 16, 64, 15, 128
    T = (h // tile) * (w // tile)
    tsz = tile * tile

    key = jax.random.PRNGKey(0)
    rays = jax.random.normal(key, (h, w, 3))
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    desc = jax.random.normal(jax.random.PRNGKey(1), (h, w, 24))
    q_rays = jax.random.normal(jax.random.PRNGKey(2), (T, tsz, 3))
    q_rays = q_rays / jnp.linalg.norm(q_rays, axis=-1, keepdims=True)
    q_desc = jax.random.normal(jax.random.PRNGKey(3), (T, tsz, 24))
    corners = jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (T, 1))

    for variant in ["dma", "ray", "stencil", "full"]:
        out = run_variant(rays, desc, q_rays, q_desc, corners,
                          variant, crop, window, sub_q)
        np.asarray(out)
        st = {"c": corners}

        def step(k):
            return run_variant(rays, desc, q_rays, q_desc, st["c"],
                               variant, crop, window, sub_q)

        print(f"{variant}_ms: {chain_time(step, n=10)*1e3:.2f}", flush=True)


if __name__ == "__main__":
    main()
