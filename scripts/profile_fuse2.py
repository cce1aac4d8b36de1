#!/usr/bin/env python
"""Probe larger fusions: decode+match+track, then the full frame program."""

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
    which = sys.argv[1] if len(sys.argv) > 1 else "dmt"

    from monst3r_slam_tpu.models import mast3r as model_api
    from monst3r_slam_tpu.models.config import MAST3R_512
    from monst3r_slam_tpu.models.init import init_params
    from monst3r_slam_tpu.ops import matching, matching_tiled
    from monst3r_slam_tpu.slam import tracker as tracker_mod
    from monst3r_slam_tpu.core import lie
    from monst3r_slam_tpu.models import croco

    h, w = 384, 512
    hw = h * w
    cfg = MAST3R_512
    match_cfg = matching.MatchingConfig()
    tcfg = matching_tiled.TiledConfig()
    track_cfg = tracker_mod.TrackingConfig(Q_conf=-1e9, C_conf=-1e9, min_match_frac=0.0)

    params = init_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3)) * 0.5
    kf_X = jax.random.normal(jax.random.PRNGKey(2), (hw, 3)) + jnp.asarray([0.0, 0.0, 3.0])
    kf_C = jnp.full((hw, 1), 2.0)
    T_WCk = lie.sim3_identity()

    feat, pos = model_api.encode(params, cfg, img)
    np.asarray(feat)

    def tail(out, idx_init, T):
        idx_f2k, valid_k = matching_tiled.match_tiled(
            out.X1.reshape(1, h, w, 3), out.X2.reshape(1, h, w, 3),
            out.D1, out.D2, idx_init,
            cfg=match_cfg, tcfg=tcfg, use_init=True, use_pallas=True,
        )
        res = tracker_mod.track_pose(
            track_cfg, (h, w), False, idx_f2k[0], valid_k[0],
            out.Q1.reshape(hw, 1), out.Q2.reshape(hw, 1),
            out.X1.reshape(hw, 3), out.C1.reshape(hw, 1),
            kf_X, kf_C, T, T_WCk)
        return res.T_WCf, idx_f2k

    idx0 = jnp.arange(hw, dtype=jnp.int32)[None]

    if which == "dmt":
        @jax.jit
        def prog(f, idx_init, T):
            out = model_api.decode(params, cfg, f, pos, feat, pos, (h, w))
            return tail(out, idx_init, T)
    else:
        @jax.jit
        def prog(im, idx_init, T):
            f, p = croco.encode_image(params, cfg, im)
            out = model_api.decode(params, cfg, f, p, feat, pos, (h, w))
            return tail(out, idx_init, T)

    arg0 = feat if which == "dmt" else img
    T, idx = prog(arg0, idx0, T_WCk)
    np.asarray(T)
    print(f"{which} compile OK", flush=True)

    st = {"T": T, "idx": idx}

    def step(k):
        st["T"], st["idx"] = prog(arg0, st["idx"], st["T"])
        return st["T"]

    t = chain_time(step, n=10, warmup=2)
    print(f"{which}_fused_ms: {t*1e3:.2f}", flush=True)


if __name__ == "__main__":
    main()
