#!/usr/bin/env python
"""Solo-time the matcher variants on the TPU with honest (np.asarray) syncs.

XLA tiled vs Pallas tiled, plus agreement between the two on coherent data.
"""

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
    from functools import partial

    from monst3r_slam_tpu.ops import matching, matching_tiled

    h, w = 384, 512
    hw = h * w
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    X11 = jnp.stack([(xx - w / 2) / 100, (yy - h / 2) / 100,
                     3.0 + 0.1 * jnp.sin(xx / 37) * jnp.cos(yy / 53)], -1)[None]
    shift = 9
    X21 = jnp.roll(X11, shift, axis=2)
    D11 = jax.random.normal(k1, (1, h, w, 24))
    D11 = D11 / jnp.linalg.norm(D11, axis=-1, keepdims=True)
    D21 = jnp.roll(D11, shift, axis=2)
    idx0 = jnp.arange(hw, dtype=jnp.int32)[None]

    cfg = matching.MatchingConfig()
    tcfg = matching_tiled.TiledConfig()

    mat_xla = partial(matching_tiled.match_tiled, cfg=cfg, tcfg=tcfg,
                      use_init=True, use_pallas=False)
    mat_pal = partial(matching_tiled.match_tiled, cfg=cfg, tcfg=tcfg,
                      use_init=True, use_pallas=True)

    i_x, v_x = mat_xla(X11, X21, D11, D21, idx0)
    np.asarray(i_x)
    # chain: feed the produced idx back as the warm start (real data dep)
    state = {"idx": i_x}

    def step_x(k):
        i, v = mat_xla(X11, X21, D11, D21, state["idx"])
        state["idx"] = i
        return i

    t = chain_time(step_x)
    print(f"xla_tiled_ms: {t*1e3:.2f}", flush=True)

    i_p, v_p = mat_pal(X11, X21, D11, D21, idx0)
    np.asarray(i_p)
    state["idx"] = i_p

    def step_p(k):
        i, v = mat_pal(X11, X21, D11, D21, state["idx"])
        state["idx"] = i
        return i

    t = chain_time(step_p)
    print(f"pallas_tiled_ms: {t*1e3:.2f}", flush=True)

    i_x, v_x = map(np.asarray, mat_xla(X11, X21, D11, D21, idx0))
    i_p, v_p = map(np.asarray, mat_pal(X11, X21, D11, D21, idx0))
    both = (v_x[0, :, 0] & v_p[0, :, 0])
    agree = (i_x[0] == i_p[0])[both].mean() if both.any() else float("nan")
    print(f"valid_xla: {v_x.mean():.4f} valid_pallas: {v_p.mean():.4f} "
          f"agree_on_valid: {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
