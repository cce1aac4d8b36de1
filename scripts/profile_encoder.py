#!/usr/bin/env python
"""Ablate the ViT-L encoder cost on TPU: param dtype, attention path, rope."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpu_timeit import chain_time


def main():
    from monst3r_slam_tpu.models import mast3r as model_api
    from monst3r_slam_tpu.models import blocks, croco
    from monst3r_slam_tpu.models.config import MAST3R_512
    from monst3r_slam_tpu.models.convert import cast_params_for_inference
    from monst3r_slam_tpu.models.init import init_params

    h, w = 384, 512
    cfg = MAST3R_512
    params = init_params(jax.random.PRNGKey(0), cfg)
    params_bf = cast_params_for_inference(params)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3)) * 0.5

    def timed(name, fn, feed):
        out = fn(img)
        np.asarray(out[0] if isinstance(out, tuple) else out)
        st = {"img": img}

        def step(k):
            o = fn(st["img"])
            f = o[0] if isinstance(o, tuple) else o
            st["img"] = feed(f)
            return f

        t = chain_time(step, n=10, warmup=2)
        print(f"{name}_ms: {t*1e3:.2f}", flush=True)

    feed_enc = lambda f: img + 1e-6 * f[0, 0, :3].astype(jnp.float32)[None, None, None, :]

    timed("encode_f32params", lambda im: model_api.encode(params, cfg, im), feed_enc)
    timed("encode_bf16params", lambda im: model_api.encode(params_bf, cfg, im), feed_enc)

    # attention-free: zero out by replacing sdpa? Instead time one component:
    # 24x MLP-only scan (the FLOPs majority) on bf16 params
    import functools

    @jax.jit
    def mlp_only(p, im):
        tokens, pos = croco.patch_embed(
            p["patch_embed"], im.astype(jnp.bfloat16), cfg.patch_size)

        def body(x, blk):
            return x + blocks.mlp(blk["mlp"], blocks.layernorm(blk["norm2"], x)), None

        x, _ = jax.lax.scan(body, tokens, p["enc_blocks"])
        return x

    timed("mlp_scan_only", functools.partial(mlp_only, params_bf), feed_enc)

    @jax.jit
    def attn_only(p, im):
        tokens, pos = croco.patch_embed(
            p["patch_embed"], im.astype(jnp.bfloat16), cfg.patch_size)

        def body(x, blk):
            return x + blocks.self_attention(
                blk["attn"], blocks.layernorm(blk["norm1"], x), pos,
                cfg.enc_heads, cfg.rope_freq), None

        x, _ = jax.lax.scan(body, tokens, p["enc_blocks"])
        return x

    timed("attn_scan_only", functools.partial(attn_only, params_bf), feed_enc)

    @jax.jit
    def attn_norope(p, im):
        tokens, pos = croco.patch_embed(
            p["patch_embed"], im.astype(jnp.bfloat16), cfg.patch_size)

        def body(x, blk):
            return x + blocks.self_attention(
                blk["attn"], blocks.layernorm(blk["norm1"], x), pos,
                cfg.enc_heads, None), None

        x, _ = jax.lax.scan(body, tokens, p["enc_blocks"])
        return x

    timed("attn_scan_norope", functools.partial(attn_norope, params_bf), feed_enc)

    from monst3r_slam_tpu.ops.attention import sdpa as sdpa_dispatch

    @jax.jit
    def attn_pallas(p, im):
        tokens, pos = croco.patch_embed(
            p["patch_embed"], im.astype(jnp.bfloat16), cfg.patch_size)

        def body(x, blk):
            xin = blocks.layernorm(blk["norm1"], x)
            qkv = blocks.linear(blk["attn"]["qkv"], xin)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (blocks._heads_split(t, cfg.enc_heads) for t in (q, k, v))
            from monst3r_slam_tpu.models.rope import apply_rope2d
            q = apply_rope2d(q, pos, cfg.rope_freq)
            k = apply_rope2d(k, pos, cfg.rope_freq)
            out = sdpa_dispatch(q, k, v, use_pallas=True)
            return x + blocks.linear(blk["attn"]["proj"], blocks._heads_merge(out)), None

        x, _ = jax.lax.scan(body, tokens, p["enc_blocks"])
        return x

    import functools as _ft
    timed("attn_scan_pallas", _ft.partial(attn_pallas, params_bf), feed_enc)


if __name__ == "__main__":
    main()
