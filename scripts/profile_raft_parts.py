#!/usr/bin/env python
"""A/B the factored (separable) corr-lookup against the 81-tap matmul form.

The RAFT tap grid is rank-1 (9 row x 9 col integer offsets), so the
(N, 81, hl) one-hot weight matrices contain only 9 distinct rows; the
separable form materializes (N, 9, hl) + (N, 9, wl) instead and contracts
in two steps. This script times the full 20-iteration flow program both
ways on the current backend, plus the corr-lookup scan in isolation.
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

from monst3r_slam_tpu.dynamic import raft


def timeit(fn, n=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn()
    np.asarray(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    h, w = 384, 512
    cfg = raft.RAFTConfig()
    params = raft.init_raft_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.integers(0, 255, (h, w, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.integers(0, 255, (h, w, 3)).astype(np.float32))

    # isolated lookup scan: 20 iterations of corr_lookup only
    hl, wl = h // 8, w // 8
    pyr = tuple(
        jax.random.normal(
            jax.random.PRNGKey(l), (hl * wl, hl >> l, wl >> l), jnp.float32
        )
        for l in range(cfg.corr_levels)
    )
    flow0 = jax.random.normal(jax.random.PRNGKey(9), (hl, wl, 2)) * 5.0

    def lookup_scan(use_sep):
        @jax.jit
        def prog(flow):
            def body(f, _):
                c = raft.corr_lookup(
                    pyr, f, cfg.corr_radius, use_mm=True, use_sep=use_sep
                )
                return f + 1e-3 * c[..., :2], None
            f, _ = jax.lax.scan(body, flow, None, length=cfg.iters)
            return f
        return prog

    for use_sep in (False, True):
        ms = timeit(lambda p=lookup_scan(use_sep): p(flow0))
        print(f"lookup_scan_20it use_sep={use_sep}: {ms:.2f} ms", flush=True)

    for use_sep in (False, True):
        raft._LOOKUP_SEP = use_sep  # toggle used by raft_flow
        raft.raft_flow.clear_cache()  # global isn't part of the jit key
        fn = lambda a, b: raft.raft_flow(params, a, b, cfg)
        ms = timeit(lambda: fn(i1, i2))
        print(f"raft_flow_20it use_sep={use_sep}: {ms:.2f} ms", flush=True)
        f1 = np.asarray(fn(i1, i2))
        if use_sep:
            d = np.abs(f1 - f_ref)
            print(f"  flow diff vs non-sep: mean {d.mean():.4f} max {d.max():.4f}")
        else:
            f_ref = f1


if __name__ == "__main__":
    main()
