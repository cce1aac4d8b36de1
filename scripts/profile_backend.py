#!/usr/bin/env python
"""On-chip cost of the global GN backend solve at keyframe-churn shapes.

The e2e churn bench showed ~5 s per async backend job (22 jobs -> 112 s
drain); this isolates gauss_newton at the (P, E) buckets that run hits.
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


def main():
    from monst3r_slam_tpu.slam import backend

    h, w = 384, 512
    hw = h * w
    subsample = int(os.environ.get("BACKEND_SUBSAMPLE", "1"))
    # delta_norm=0 forces the full max_iters loop: honest per-iteration cost
    cfg = backend.BackendConfig(
        Q_conf=-1e9, C_conf=-1e9, delta_norm=0.0, pixel_subsample=subsample
    )
    print(f"pixel_subsample={subsample}", flush=True)

    for P, E, n_kf in [(8, 8, 6), (16, 32, 12), (32, 64, 24)]:
        key = jax.random.PRNGKey(0)
        # Sim3 layout [t(3), q(4), s]: qw at index 6, scale at index 7
        Twc = jnp.zeros((P, 8)).at[:, 6:].set(1.0)
        Twc = Twc.at[:, 0].set(jnp.arange(P) * 0.01)
        Xs = jax.random.normal(key, (P, hw, 3)) * 0.5 + jnp.asarray([0, 0, 3.0])
        Cs = jnp.full((P, hw, 1), 2.0)
        rng = np.random.default_rng(0)
        ii_np = rng.integers(0, n_kf, (E,)).astype(np.int32)
        jj_np = ((ii_np + 1) % n_kf).astype(np.int32)
        ii, jj = jnp.asarray(ii_np), jnp.asarray(jj_np)
        idx = jnp.tile(jnp.arange(hw, dtype=jnp.int32)[None], (E, 1))
        vm = jnp.ones((E, hw), bool)
        Q = jnp.full((E, hw), 2.0)
        ev = jnp.ones((E,), bool)

        out, iters = backend.gauss_newton(
            Twc, Xs, Cs, ii, jj, idx, vm, Q, ev, cfg, P
        )
        np.asarray(out)
        t0 = time.perf_counter()
        n = 3
        for k in range(n):
            out, iters = backend.gauss_newton(
                Twc + 1e-6 * k, Xs, Cs, ii, jj, idx, vm, Q, ev, cfg, P
            )
        np.asarray(out)
        dt = (time.perf_counter() - t0) / n
        print(
            f"P={P:3d} E={E:3d}: {dt*1e3:8.1f} ms/solve "
            f"(iters={int(iters)}, {dt*1e3/int(iters):6.1f} ms/iter)",
            flush=True,
        )


if __name__ == "__main__":
    main()
