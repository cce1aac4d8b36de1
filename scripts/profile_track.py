#!/usr/bin/env python
"""Tracker GN loop cost: fixed overhead vs per-iteration, on TPU."""

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
    from monst3r_slam_tpu.slam import tracker as tracker_mod
    from monst3r_slam_tpu.core import lie

    h, w = 384, 512
    hw = h * w
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    idx_f2k = jax.random.randint(ks[0], (hw,), 0, hw)
    valid = jnp.ones((hw, 1), bool)
    Q1 = jnp.abs(jax.random.normal(ks[1], (hw, 1))) + 1.0
    Q2 = jnp.abs(jax.random.normal(ks[2], (hw, 1))) + 1.0
    Xf = jax.random.normal(ks[3], (hw, 3)) + jnp.asarray([0.0, 0.0, 3.0])
    Cf = jnp.full((hw, 1), 2.0)
    Xk = Xf + 0.01 * jax.random.normal(ks[4], (hw, 3))
    Ck = jnp.full((hw, 1), 2.0)
    T0 = lie.sim3_identity()

    for iters in (50, 25, 10, 1):
        cfg = tracker_mod.TrackingConfig(
            Q_conf=-1e9, C_conf=-1e9, min_match_frac=0.0, max_iters=iters,
            rel_error=0.0, delta_norm=0.0,  # force the full iteration count
        )

        @functools.partial(jax.jit, static_argnames=())
        def trk(T, cfg=cfg):
            return tracker_mod.track_pose(
                cfg, (h, w), False, idx_f2k, valid, Q1, Q2, Xf, Cf,
                Xk, Ck, T, T0).T_WCf

        T = trk(T0)
        np.asarray(T)
        st = {"T": T}

        def step(k):
            st["T"] = trk(st["T"] * (1.0 - 1e-9))
            return st["T"]

        print(f"track_iters{iters}_ms: {chain_time(step)*1e3:.2f}", flush=True)


if __name__ == "__main__":
    main()
