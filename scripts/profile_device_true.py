"""True device-time profiler: iterate the target INSIDE one jit program.

The chain_time harness feeds an eager op between jitted calls; on the axon
relay every eager op is its own program dispatch, so small kernels measure
their dispatch floor, not their device time. Here the N iterations run under
a single `lax.fori_loop` inside ONE jit program with a data dependence, so
the wall time / N is pure device time (amortizing one dispatch).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def loop_time(make_step, params, x0, n=20, reps=3):
    """make_step: fn(params, x)->x same shape/dtype. Returns seconds/iter.

    Params are a real argument (not a closed-over constant) so the compiled
    program stays small enough for the relay's upload limit.
    """

    def run(p, x, n_iter):
        def body(_, c):
            return make_step(p, c)

        return jax.lax.fori_loop(0, n_iter, body, x)

    run_j = jax.jit(run, static_argnums=2)
    np.asarray(run_j(params, x0, n))  # compile + warm
    np.asarray(run_j(params, x0, 1))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run_j(params, x0, n))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run_j(params, x0, 1))
        t_1 = time.perf_counter() - t0
        best = min(best, (t_n - t_1) / (n - 1))
    return best


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
    img0 = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3)) * 0.5

    def enc_step(p, im):
        feat, pos = model_api.encode(p, cfg, im)
        return im + 1e-6 * feat[0, 0, :3].astype(im.dtype)[None, None, None, :]

    t = loop_time(enc_step, params_bf, img0, n=20)
    print(f"encode_true_ms: {t*1e3:.3f}", flush=True)

    # MLP-only scan
    def mlp_step(p, im):
        tokens, pos = croco.patch_embed(
            p["patch_embed"], im.astype(jnp.bfloat16), cfg.patch_size)

        def body(x, blk):
            return x + blocks.mlp(blk["mlp"], blocks.layernorm(blk["norm2"], x)), None

        x, _ = jax.lax.scan(body, tokens, p["enc_blocks"])
        return im + 1e-6 * x[0, 0, :3].astype(im.dtype)[None, None, None, :]

    t = loop_time(mlp_step, params_bf, img0, n=20)
    print(f"mlp_scan_true_ms: {t*1e3:.3f}", flush=True)

    # attention-only scan (with rope)
    def attn_step(p, im):
        tokens, pos = croco.patch_embed(
            p["patch_embed"], im.astype(jnp.bfloat16), cfg.patch_size)

        def body(x, blk):
            return x + blocks.self_attention(
                blk["attn"], blocks.layernorm(blk["norm1"], x), pos,
                cfg.enc_heads, cfg.rope_freq), None

        x, _ = jax.lax.scan(body, tokens, p["enc_blocks"])
        return im + 1e-6 * x[0, 0, :3].astype(im.dtype)[None, None, None, :]

    t = loop_time(attn_step, params_bf, img0, n=20)
    print(f"attn_scan_true_ms: {t*1e3:.3f}", flush=True)

    # attention-only, no rope
    def attn_norope_step(p, im):
        tokens, pos = croco.patch_embed(
            p["patch_embed"], im.astype(jnp.bfloat16), cfg.patch_size)

        def body(x, blk):
            return x + blocks.self_attention(
                blk["attn"], blocks.layernorm(blk["norm1"], x), pos,
                cfg.enc_heads, None), None

        x, _ = jax.lax.scan(body, tokens, p["enc_blocks"])
        return im + 1e-6 * x[0, 0, :3].astype(im.dtype)[None, None, None, :]

    t = loop_time(attn_norope_step, params_bf, img0, n=20)
    print(f"attn_norope_true_ms: {t*1e3:.3f}", flush=True)

    # decode (pair) true time, full decode + DPT/desc heads
    feat, pos = model_api.encode(params_bf, cfg, img0)

    def dec_step(p, f):
        out = model_api.decode(p, cfg, f, pos, f, pos, (h, w))
        d = out.X1[0, 0, 0, :].astype(f.dtype)  # (3,)
        return f + 1e-6 * jnp.pad(d, (0, f.shape[-1] - 3))[None, None, :]

    t = loop_time(dec_step, params_bf, feat, n=10)
    print(f"decode_true_ms: {t*1e3:.3f}", flush=True)

    # batch-2 pair decode (keyframe-event edge batch)
    feat2 = jnp.concatenate([feat, feat], axis=0)
    pos2 = jnp.concatenate([pos, pos], axis=0)

    def dec2_step(p, f):
        out = model_api.decode(p, cfg, f, pos2, f, pos2, (h, w))
        d = out.X1[0, 0, 0, :].astype(f.dtype)
        return f + 1e-6 * jnp.pad(d, (0, f.shape[-1] - 3))[None, None, :]

    t = loop_time(dec2_step, params_bf, feat2, n=10)
    print(f"decode_b2_true_ms: {t*1e3:.3f}", flush=True)

    # full frame chain: encode -> pair decode + heads (the tracking path's
    # model work; match+track adds the fused GN program on top)
    def chain_step(p, im):
        f, ps = model_api.encode(p, cfg, im)
        out = model_api.decode(p, cfg, f, ps, f, ps, (h, w))
        return im + 1e-6 * out.X1[:, :1, :1, :].astype(im.dtype)

    t = loop_time(chain_step, params_bf, img0, n=10)
    print(f"encode_decode_true_ms: {t*1e3:.3f}", flush=True)


if __name__ == "__main__":
    main()
