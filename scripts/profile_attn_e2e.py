#!/usr/bin/env python
"""Measure encode/decode with the fused Pallas attention vs the einsum path,
and check numerical agreement of the decoded outputs on TPU."""

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
    mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"  # or "einsum"
    os.environ["MONST3R_PALLAS_ATTN"] = "1" if mode == "pallas" else "0"

    from monst3r_slam_tpu.models import mast3r as model_api
    from monst3r_slam_tpu.models.config import MAST3R_512
    from monst3r_slam_tpu.models.init import init_params

    h, w = 384, 512
    cfg = MAST3R_512
    params = init_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3)) * 0.5

    feat, pos = model_api.encode(params, cfg, img)
    out = model_api.decode(params, cfg, feat, pos, feat, pos, (h, w))
    np.asarray(out.X1)

    st = {"img": img}

    def enc_step(k):
        f, p = model_api.encode(params, cfg, st["img"])
        st["img"] = img + 1e-6 * f[0, 0, :3].astype(jnp.float32)[None, None, None, :]
        return f

    print(f"encode_{mode}_ms: {chain_time(enc_step)*1e3:.2f}", flush=True)

    st2 = {"feat": feat}

    def dec_step(k):
        o = model_api.decode(params, cfg, st2["feat"], pos, feat, pos, (h, w))
        st2["feat"] = feat + 1e-6 * o.C1[0, 0, 0]
        return o.X1

    print(f"decode_{mode}_ms: {chain_time(dec_step)*1e3:.2f}", flush=True)

    # dump outputs for cross-mode comparison
    np.savez(f"/tmp/attn_{mode}.npz",
             X1=np.asarray(out.X1, np.float32),
             C1=np.asarray(out.C1, np.float32),
             D1=np.asarray(out.D1, np.float32))
    other = f"/tmp/attn_{'einsum' if mode == 'pallas' else 'pallas'}.npz"
    if os.path.exists(other):
        ref = np.load(other)
        cur = np.load(f"/tmp/attn_{mode}.npz")
        for k in ("X1", "C1", "D1"):
            a, b = cur[k], ref[k]
            denom = np.abs(b).mean() + 1e-9
            print(f"{k}: mean|diff|/mean|ref| = {np.abs(a-b).mean()/denom:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
