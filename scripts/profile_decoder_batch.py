#!/usr/bin/env python
"""Does batching the dual decoder's two streams into one vmapped block pass
beat the current per-stream lockstep? (blocks-only cost, ViT-L, 384x512)

Current decode_pair runs, per scan step, decoder_block(p1, x1, mem=x2) then
decoder_block(p2, x2, mem=x1): every matmul is batch-B. The batched variant
stacks the streams (leading dim 2) and vmaps one block over stacked weights,
so each matmul becomes a 2-group batched dot on the MXU and the attention
kernel sees batch 2B.

MEASURED (v5e, 2026-08): NEGATIVE. Isolated blocks-only looked ~20% faster
batched, but a 40-rep A/B of the FULL decode showed 19.2-19.3 ms batched vs
17.6-17.9 ms lockstep — the stacked carry + per-step x[::-1] reindex cost
more than the halved launch count saves. decode_pair stays lockstep.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpu_timeit import chain_time


def main():
    from monst3r_slam_tpu.models import blocks, croco
    from monst3r_slam_tpu.models import mast3r as model_api
    from monst3r_slam_tpu.models.config import MAST3R_512
    from monst3r_slam_tpu.models.convert import cast_params_for_inference
    from monst3r_slam_tpu.models.init import init_params

    h, w = 384, 512
    cfg = MAST3R_512
    params = cast_params_for_inference(init_params(jax.random.PRNGKey(0), cfg))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3)) * 0.5
    feat, pos = model_api.encode(params, cfg, img)
    np.asarray(feat)

    dtype = jnp.bfloat16

    @jax.jit
    def current(p, f):
        dec1, dec2 = croco.decode_pair(p, cfg, f, pos, feat, pos, dtype)
        return dec1[3]

    @jax.jit
    def batched(p, f):
        f1 = blocks.linear(p["decoder_embed"], f.astype(dtype))
        f2 = blocks.linear(p["decoder_embed"], feat.astype(dtype))
        x = jnp.stack([f1, f2])  # (2, B, N, d)
        xpos = jnp.stack([pos, pos])
        mpos = jnp.stack([pos, pos])

        blk = jax.vmap(
            lambda bp, xx, mem, xp, mp: blocks.decoder_block(
                bp, xx, mem, xp, mp, cfg.dec_heads, cfg.rope_freq, cfg.ln_eps
            )
        )

        def body(carry, bp2):
            x = carry
            mem = x[::-1]  # stream 1 attends to 2 and vice versa
            n = blk(bp2, x, mem, xpos, mpos)
            return n, n

        # stack dec_blocks / dec_blocks2 along a new leading axis per step
        bp2 = jax.tree.map(
            lambda a, b: jnp.stack([a, b], axis=1),
            p["dec_blocks"], p["dec_blocks2"],
        )
        x, outs = jax.lax.scan(body, x, bp2)
        h3 = cfg.hooks[3] - 1
        final1 = blocks.layernorm(p["dec_norm"], outs[h3][0], cfg.ln_eps)
        return final1

    def timed(name, fn):
        out = fn(params, feat)
        np.asarray(out)
        st = {"f": feat}

        def step(k):
            o = fn(params, st["f"])
            st["f"] = feat + 1e-6 * o.reshape(-1)[0].astype(jnp.float32)
            return o

        print(f"{name}_ms: {chain_time(step)*1e3:.2f}", flush=True)

    timed("blocks_lockstep", current)
    timed("blocks_streambatched", batched)

    # numeric agreement (bf16 compute, so tolerance is loose)
    a = current(params, feat)
    b = batched(params, feat)
    print("max diff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
