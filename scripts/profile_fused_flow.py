#!/usr/bin/env python
"""Measure the production fused flow+ego+err program (host-in/host-out, as
the monster loop calls it) with the separable corr lookup on and off."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.core import lie
from monst3r_slam_tpu.dynamic import raft


def main():
    h, w = 384, 512
    cfg = raft.RAFTConfig()
    params = raft.init_raft_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    u1 = rng.integers(0, 255, (h, w, 3), np.uint8)
    u2 = rng.integers(0, 255, (h, w, 3), np.uint8)
    T_i = jnp.asarray(lie.sim3_identity())
    T_j = T_i
    depth = jnp.ones((h, w), jnp.float32) * 3.0
    K = jnp.asarray(
        [[0.6 * w, 0.0, w / 2], [0.0, 0.6 * w, h / 2], [0.0, 0.0, 1.0]],
        jnp.float32,
    )

    norm1 = jnp.asarray((u1.astype(np.float32) / 255.0 - 0.5) / 0.5)

    def bench(label, adapter, args_fn):
        for _ in range(3):
            adapter(*args_fn())
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            adapter(*args_fn())
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{label}: {ms:.2f} ms", flush=True)

    # old behavior: fresh host u8 uploads every call (cache-missing copies),
    # f32 error map back
    ad_f32 = raft.make_fused_flow_error_program(params, cfg, out_u8=False)
    bench("host u8 x2 fresh, f32 out", ad_f32,
          lambda: (u1.copy(), u2.copy(), T_i, T_j, depth, K))
    # u8 return transfer only
    ad_u8 = raft.make_fused_flow_error_program(params, cfg, out_u8=True)
    bench("host u8 x2 fresh, u8 out", ad_u8,
          lambda: (u1.copy(), u2.copy(), T_i, T_j, depth, K))
    # production: device-resident frame img + cached keyframe u8 + u8 out
    bench("device img_i + cached kf, u8 out", ad_u8,
          lambda: (norm1, u2, T_i, T_j, depth, K))


if __name__ == "__main__":
    main()
