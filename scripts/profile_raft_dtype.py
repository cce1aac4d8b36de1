"""A/B bf16-vs-f32 RAFT within one process (cross-run variance is large).

Times raft_flow at both dtypes back-to-back on the same inputs and reports
the flow discrepancy (mean/max endpoint error in pixels) between them.
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

from monst3r_slam_tpu.dynamic import raft as raft_mod

h, w = 384, 512


def timeit(name, fn, n=8):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:30s} {dt:9.2f} ms")
    return dt


def main():
    cfg = raft_mod.RAFTConfig()
    params = raft_mod.init_raft_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(0)
    u0 = rng.integers(0, 255, (h, w, 3), np.uint8)
    u1 = np.roll(u0, 3, axis=1).copy()
    u1[120:180, 200:280] = 255 - u1[120:180, 200:280]
    fi = jnp.asarray(u0, jnp.float32)
    fj = jnp.asarray(u1, jnp.float32)

    f32 = lambda: raft_mod.raft_flow(params, fi, fj, cfg, dtype=jnp.float32)
    b16 = lambda: raft_mod.raft_flow(params, fi, fj, cfg, dtype=jnp.bfloat16)
    t_f32 = timeit("raft f32", f32)
    t_b16 = timeit("raft bf16", b16)
    # interleave a second pass to wash out drift
    t_f32b = timeit("raft f32 (2nd)", f32)
    t_b16b = timeit("raft bf16 (2nd)", b16)

    a = np.asarray(f32())
    b = np.asarray(b16())
    epe = np.linalg.norm(a - b, axis=-1)
    print(f"flow |f32| mean {np.linalg.norm(a, axis=-1).mean():.3f} px")
    print(f"epe f32-vs-bf16 mean {epe.mean():.4f} max {epe.max():.4f} px")
    print(f"speedup {min(t_f32, t_f32b) / min(t_b16, t_b16b):.3f}x")


if __name__ == "__main__":
    main()
