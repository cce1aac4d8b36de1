#!/usr/bin/env python
"""Decode cost split: dual decoder blocks vs DPT head vs catMLP head."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
import numpy as np

from tpu_timeit import chain_time


def main():
    from monst3r_slam_tpu.models import croco, heads
    from monst3r_slam_tpu.models import mast3r as model_api
    from monst3r_slam_tpu.models.config import MAST3R_512
    from monst3r_slam_tpu.models.dpt import dpt_forward
    from monst3r_slam_tpu.models.init import init_params

    from monst3r_slam_tpu.models.convert import cast_params_for_inference

    h, w = 384, 512
    cfg = MAST3R_512
    n_h, n_w = h // cfg.patch_size, w // cfg.patch_size
    # bf16 weights: the production inference configuration
    params = cast_params_for_inference(init_params(jax.random.PRNGKey(0), cfg))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3)) * 0.5
    feat, pos = model_api.encode(params, cfg, img)
    np.asarray(feat)

    def timed(name, fn):
        # params passed as a jit ARGUMENT: capturing them as closure
        # constants ships the full ViT-L weights inside every remote-compile
        # request (the historical "profile_decode dies on the compiler").
        out = fn(params, feat)
        np.asarray(out[0] if isinstance(out, tuple) else out)
        st = {"f": feat}

        def step(k):
            o = fn(params, st["f"])
            o0 = o[0] if isinstance(o, tuple) else o
            st["f"] = feat + 1e-6 * o0.reshape(-1)[0].astype(jnp.float32)
            return o0

        print(f"{name}_ms: {chain_time(step)*1e3:.2f}", flush=True)

    @jax.jit
    def blocks_only(p, f):
        dec1, dec2 = croco.decode_pair(p, cfg, f, pos, feat, pos)
        return dec1[3]

    timed("dec_blocks_only", blocks_only)

    @jax.jit
    def blocks_dpt(p, f):
        dec1, dec2 = croco.decode_pair(p, cfg, f, pos, feat, pos)
        f1 = dpt_forward(p["head1"]["dpt"], cfg, dec1, n_h, n_w)
        f2 = dpt_forward(p["head2"]["dpt"], cfg, dec2, n_h, n_w)
        return f1 + f2

    timed("dec_blocks_2xdpt", blocks_dpt)

    def full(p, f):
        return model_api.decode(p, cfg, f, pos, feat, pos, (h, w)).X1

    timed("decode_full", full)

    def full_fused(p, f):
        return model_api.decode(
            p, cfg, f, pos, feat, pos, (h, w), fused_heads=True
        ).X1

    timed("decode_full_fusedheads", full_fused)


if __name__ == "__main__":
    main()
