#!/usr/bin/env python
"""Benchmark: end-to-end per-frame tracking compute on one TPU chip.

Measures the full per-frame SLAM tracking path of the flagship model
(MASt3R ViT-L, 512x384, bf16 matmuls): encoder + dual decoder + DPT/catMLP
heads + tiled MXU matching + Sim(3) GN tracking. Reference baseline:
0.16-0.19 FPS end-to-end for the dynamic MonST3R pipeline on a >=12GB CUDA
GPU (BASELINE.md).

Timing: the whole frame step is ONE jitted program; iterations chain real
data (previous pose/index warm-start feeds the next frame), and the final
pose is fetched to host (plain block_until_ready under-reports on this
remote-TPU stack).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

# Persistent compilation cache: remote TPU compiles here run minutes;
# repeated bench invocations must not pay them again.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 0.185  # reference committed run logs (BASELINE.md)


def main():
    from monst3r_slam_tpu.models import mast3r as model_api
    from monst3r_slam_tpu.models.config import MAST3R_512
    from monst3r_slam_tpu.models.init import init_params
    from monst3r_slam_tpu.ops import matching, matching_tiled
    from monst3r_slam_tpu.slam import tracker as tracker_mod
    from monst3r_slam_tpu.core import lie

    h, w = 384, 512
    hw = h * w
    cfg = MAST3R_512
    n_h, n_w = h // cfg.patch_size, w // cfg.patch_size
    match_cfg = matching.MatchingConfig()
    tcfg = matching_tiled.TiledConfig()
    track_cfg = tracker_mod.TrackingConfig(Q_conf=-1e9, C_conf=-1e9, min_match_frac=0.0)

    params = init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (1, h, w, 3)) * 0.5

    kf_X = jax.random.normal(key, (hw, 3)) + jnp.asarray([0.0, 0.0, 3.0])
    kf_C = jnp.full((hw, 1), 2.0)
    T_WCk = lie.sim3_identity()

    # Three dispatches per frame: encode | decode | match+track fused.
    # (decode+match+track in ONE program times out the remote compiler; the
    # per-dispatch overhead of this split is part of the honest cost.)
    # encode/decode are the same staged programs the SLAM pipeline itself
    # dispatches; match+track mirrors pipeline._match_track_and_update.
    @jax.jit
    def perturb(T_prev):
        return img + 1e-6 * T_prev[0]

    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def match_track(out, idx_prev, T_prev):
        idx_f2k, valid_k = matching_tiled.match_tiled(
            out.X1.reshape(1, h, w, 3), out.X2.reshape(1, h, w, 3),
            out.D1, out.D2, idx_prev,
            cfg=match_cfg, tcfg=tcfg, use_init=True, use_pallas=use_pallas,
        )
        T = tracker_mod.track_pose(
            track_cfg, (h, w), False,
            idx_f2k[0], valid_k[0],
            out.Q1.reshape(hw, 1), out.Q2.reshape(hw, 1),
            out.X1.reshape(hw, 3), out.C1.reshape(hw, 1),
            kf_X, kf_C, T_prev, T_WCk,
        ).T_WCf
        return T, idx_f2k

    def frame_step(T_prev, idx_prev, kf_feat, kf_pos):
        img_t = perturb(T_prev)
        feat, pos = model_api.encode(params, cfg, img_t)
        out = model_api.decode(params, cfg, feat, pos, kf_feat, kf_pos, (h, w))
        T, idx_f2k = match_track(out, idx_prev, T_prev)
        return T, idx_f2k

    kf_feat, kf_pos = model_api.encode(params, cfg, img)
    T, idx = frame_step(T_WCk, jnp.arange(hw, dtype=jnp.int32)[None], kf_feat, kf_pos)
    np.asarray(T)  # force compile + first run

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        T, idx = frame_step(T, idx, kf_feat, kf_pos)
    np.asarray(T)  # force completion of the chained sequence
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "tracking_fps_512x384_vitl",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
