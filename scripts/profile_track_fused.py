"""Decompose the real loop's fused tracking program cost.

BENCH_r03 e2e frames block ~110 ms on the device chain while the staged
bench's encode+decode+match+track measures ~39 ms. The only program that
differs is `_match_track_and_update` (full keyframe-memory buffers, fusion,
GN, in-place kf update) vs the staged `match_track` (match + GN only).
This script chain-times both plus ablations, one TPU process, warm cache.

Env: CAP=512 N=10
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

from monst3r_slam_tpu.app import pipeline as pl
from monst3r_slam_tpu.core import lie
from monst3r_slam_tpu.ops import matching, matching_tiled
from monst3r_slam_tpu.slam import tracker as tracker_mod
from monst3r_slam_tpu.slam.frame import make_keyframe_memory

H, W = 384, 512
HW = H * W
CAP = int(os.environ.get("CAP", "512"))
N = int(os.environ.get("N", "10"))


def chain(fn, n=N, warmup=2):
    out = None
    for k in range(warmup):
        out = fn(k, out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for k in range(n):
        out = fn(k, out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    track_cfg = tracker_mod.TrackingConfig(
        Q_conf=-1e9, C_conf=-1e9, min_match_frac=0.0
    )
    mcfg = matching.MatchingConfig(dist_thresh=1e9)
    tcfg = matching_tiled.TiledConfig()
    use_pallas = jax.default_backend() == "tpu"

    X1 = jax.random.normal(ks[0], (HW, 3)) + jnp.asarray([0.0, 0.0, 3.0])
    X2 = X1 + 0.01 * jax.random.normal(ks[1], (HW, 3))
    C1 = jnp.full((HW, 1), 2.0)
    C2 = jnp.full((HW, 1), 2.0)
    Q1 = jnp.full((HW, 1), 4.0)
    Q2 = jnp.full((HW, 1), 4.0)
    D1 = jax.random.normal(ks[2], (HW, 24))
    D1 = D1 / jnp.linalg.norm(D1, axis=-1, keepdims=True)
    D2 = D1 + 0.01 * jax.random.normal(ks[3], (HW, 24))
    idx0 = jnp.arange(HW, dtype=jnp.int32)
    T_i = lie.sim3_identity()
    fX = X1
    fC = C1
    fN = jnp.ones((), jnp.int32)
    fS = jnp.zeros(())
    K = jnp.eye(3)

    mem = make_keyframe_memory(CAP, H, W, 1024, 16)
    mem_X, mem_C = mem.X_canon, mem.C
    mem_N, mem_S = mem.N, mem.score
    kf_idx = jnp.asarray(0, jnp.int32)

    # 1. staged bench's match+track (fixed small kf arrays, no memory)
    @jax.jit
    def staged(idx_prev, T_prev):
        idx_f2k, valid_k = matching_tiled.match_tiled(
            X1.reshape(1, H, W, 3), X2.reshape(1, H, W, 3),
            D1.reshape(1, H, W, 24), D2.reshape(1, H, W, 24), idx_prev,
            cfg=mcfg, tcfg=tcfg, use_init=True, use_pallas=use_pallas,
        )
        T = tracker_mod.track_pose(
            track_cfg, (H, W), False, idx_f2k[0], valid_k[0],
            Q1, Q2, X1, C1, X2, C2, T_prev, T_i,
        ).T_WCf
        return T, idx_f2k

    def staged_step(k, prev):
        T_prev, idx_prev = (T_i, idx0[None]) if prev is None else prev
        T, idx = staged(idx_prev, T_prev)
        return T, idx

    print(f"staged match+track: {chain(staged_step):8.2f} ms", flush=True)

    # 2. the real loop's fused program (memory donated in and out)
    state = {"mem": (mem_X, mem_C, mem_N, mem_S)}

    def fused_step(k, prev):
        T_prev, idx_prev = (T_i, idx0) if prev is None else prev
        m = state["mem"]
        (nmX, nmC, nmN, nmS, _fX, _fC, _fN, _fS, res, summary,
         idx_f2k, valid_k) = pl._match_track_and_update(
            m[0], m[1], m[2], m[3], kf_idx,
            X1, C1, Q1, D1, X2, C2, Q2, D2,
            idx_prev, fX, fC, fN, fS, T_prev, T_i, K,
            track_cfg=track_cfg, img_size=(H, W), use_calib=False,
            fmode="weighted_pointmap", fscore="median",
            mcfg=mcfg, tcfg=tcfg, use_pallas=use_pallas, use_init=True,
        )
        state["mem"] = (nmX, nmC, nmN, nmS)
        return res.T_WCf, idx_f2k[0]

    print(f"fused track_and_update (cap={CAP}): {chain(fused_step):8.2f} ms",
          flush=True)

    # 3. matcher alone
    @jax.jit
    def match_only(idx_prev):
        return matching_tiled.match_tiled(
            X1.reshape(1, H, W, 3), X2.reshape(1, H, W, 3),
            D1.reshape(1, H, W, 24), D2.reshape(1, H, W, 24), idx_prev,
            cfg=mcfg, tcfg=tcfg, use_init=True, use_pallas=use_pallas,
        )

    def match_step(k, prev):
        idx_prev = idx0[None] if prev is None else prev[0]
        return match_only(idx_prev)

    print(f"matcher alone: {chain(match_step):8.2f} ms", flush=True)

    # 4. GN track_pose alone (same inputs as staged)
    @jax.jit
    def track_only(T_prev):
        return tracker_mod.track_pose(
            track_cfg, (H, W), False, idx0, jnp.ones((HW, 1), bool),
            Q1, Q2, X1, C1, X2, C2, T_prev, T_i,
        ).T_WCf

    def track_step(k, prev):
        T_prev = T_i if prev is None else prev
        return track_only(T_prev)

    print(f"track_pose alone: {chain(track_step):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
