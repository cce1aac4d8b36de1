#!/usr/bin/env python
"""Per-stage TPU timing breakdown for the tracking hot path (honest syncs).

`jax.block_until_ready` returns early on the axon relay; every measurement
here chains n dispatches with a real data dependence and forces ONE final
host transfer (np.asarray), mirroring bench.py.
"""

import json
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

    from monst3r_slam_tpu.models import mast3r as model_api
    from monst3r_slam_tpu.models.config import MAST3R_512
    from monst3r_slam_tpu.models.init import init_params
    from monst3r_slam_tpu.ops import matching, matching_tiled
    from monst3r_slam_tpu.slam import tracker as tracker_mod
    from monst3r_slam_tpu.core import lie

    h, w = 384, 512
    hw = h * w
    cfg = MAST3R_512
    match_cfg = matching.MatchingConfig()
    tcfg = matching_tiled.TiledConfig()
    track_cfg = tracker_mod.TrackingConfig(Q_conf=-1e9, C_conf=-1e9, min_match_frac=0.0)
    on_tpu = jax.default_backend() == "tpu"

    params = init_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3)) * 0.5
    kf_X = jax.random.normal(jax.random.PRNGKey(2), (hw, 3)) + jnp.asarray([0.0, 0.0, 3.0])
    kf_C = jnp.full((hw, 1), 2.0)
    T_WCk = lie.sim3_identity()

    results = {}

    def rec(k, v):
        results[k] = v
        print(f"{k}: {v:.3f}", flush=True)

    # --- dispatch floor ----------------------------------------------------
    @jax.jit
    def noop(x):
        return x + 1.0

    st = {"x": jnp.zeros((8,))}
    np.asarray(noop(st["x"]))

    def noop_step(k):
        st["x"] = noop(st["x"])
        return st["x"]

    rec("noop_chain_ms", chain_time(noop_step, n=20) * 1e3)

    # --- encode -------------------------------------------------------------
    feat, pos = model_api.encode(params, cfg, img)
    np.asarray(feat)
    st = {"img": img}

    def enc_step(k):
        f, p = model_api.encode(params, cfg, st["img"])
        st["img"] = img + 1e-6 * f[0, 0, :3][None, None, None, :]
        return f

    rec("encode_ms", chain_time(enc_step) * 1e3)

    # --- decode -------------------------------------------------------------
    out = model_api.decode(params, cfg, feat, pos, feat, pos, (h, w))
    np.asarray(out.X1)
    st = {"feat": feat}

    def dec_step(k):
        o = model_api.decode(params, cfg, st["feat"], pos, feat, pos, (h, w))
        st["feat"] = feat + 1e-6 * o.C1[0, 0, 0]
        return o.X1

    rec("decode_ms", chain_time(dec_step) * 1e3)

    # --- match (default backend path) ---------------------------------------
    X1 = out.X1.reshape(1, h, w, 3)
    X2 = out.X2.reshape(1, h, w, 3)
    idx0 = jnp.arange(hw, dtype=jnp.int32)[None]
    mat = partial(matching_tiled.match_tiled, cfg=match_cfg, tcfg=tcfg,
                  use_init=True, use_pallas=on_tpu)
    idx_f2k, valid_k = mat(X1, X2, out.D1, out.D2, idx0)
    np.asarray(idx_f2k)
    st = {"idx": idx_f2k}

    def mat_step(k):
        i, v = mat(X1, X2, out.D1, out.D2, st["idx"])
        st["idx"] = i
        return i

    rec("match_ms", chain_time(mat_step) * 1e3)

    # --- track ----------------------------------------------------------------
    Q1 = out.Q1.reshape(hw, 1)
    Q2 = out.Q2.reshape(hw, 1)
    Xf = out.X1.reshape(hw, 3)
    Cf = out.C1.reshape(hw, 1)

    def trk(T):
        return tracker_mod.track_pose(
            track_cfg, (h, w), False, idx_f2k[0], valid_k[0], Q1, Q2, Xf, Cf,
            kf_X, kf_C, T, T_WCk).T_WCf

    T = trk(T_WCk)
    np.asarray(T)
    st = {"T": T}

    def trk_step(k):
        st["T"] = trk(st["T"])
        return st["T"]

    rec("track_ms", chain_time(trk_step) * 1e3)

    # --- match+track fused (the production per-frame program, bench.py) ------
    @jax.jit
    def match_track(idx_prev, T_prev):
        i, v = matching_tiled.match_tiled(
            X1, X2, out.D1, out.D2, idx_prev,
            cfg=match_cfg, tcfg=tcfg, use_init=True, use_pallas=on_tpu)
        Tn = tracker_mod.track_pose(
            track_cfg, (h, w), False, i[0], v[0], Q1, Q2, Xf, Cf,
            kf_X, kf_C, T_prev, T_WCk).T_WCf
        return i, Tn

    i_, T_ = match_track(idx0, T_WCk)
    np.asarray(T_)
    st = {"idx": i_, "T": T_}

    def mt_step(k):
        st["idx"], st["T"] = match_track(st["idx"], st["T"])
        return st["T"]

    rec("match_track_fused_ms", chain_time(mt_step) * 1e3)

    total = sum(
        v for k, v in results.items()
        if k in ("encode_ms", "decode_ms", "match_track_fused_ms")
    )
    rec("frame_total_ms", total)
    rec("fps_bound", 1e3 / total)
    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
