#!/usr/bin/env python
"""Benchmark: end-to-end per-frame tracking compute on one TPU chip.

Measures the full per-frame SLAM tracking path of the flagship model
(MASt3R ViT-L, 512x384, bf16 matmuls): encoder + dual decoder + DPT/catMLP
heads + iterative-projection matching + descriptor refinement + Sim(3) GN
tracking. This is the hot loop of `main.py` (reference FPS baseline:
0.16-0.19 end-to-end for the dynamic MonST3R pipeline on a >=12GB CUDA GPU,
BASELINE.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 0.185  # reference committed run logs (BASELINE.md)


def main():
    from monst3r_slam_tpu.models import mast3r as model_api
    from monst3r_slam_tpu.models.config import MAST3R_512
    from monst3r_slam_tpu.models.init import init_params
    from monst3r_slam_tpu.ops import matching
    from monst3r_slam_tpu.slam import tracker as tracker_mod
    from monst3r_slam_tpu.core import lie

    h, w = 384, 512
    hw = h * w
    cfg = MAST3R_512
    match_cfg = matching.MatchingConfig()
    track_cfg = tracker_mod.TrackingConfig(Q_conf=-1e9, C_conf=-1e9, min_match_frac=0.0)

    params = init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (1, h, w, 3)) * 0.5

    # Keyframe state (prebuilt once, like the SLAM loop's cached keyframe)
    kf_feat, kf_pos = model_api.encode(params, cfg, img)
    kf_X = jax.random.normal(key, (hw, 3)) + jnp.asarray([0.0, 0.0, 3.0])
    kf_C = jnp.full((hw, 1), 2.0)
    T_WCk = lie.sim3_identity()

    def frame_step(img, kf_feat, kf_pos, kf_X, kf_C, T_WCk, idx_init):
        feat, pos = model_api.encode(params, cfg, img)
        out = model_api.decode(params, cfg, feat, pos, kf_feat, kf_pos, (h, w))
        Xff = out.X1.reshape(1, h, w, 3)
        Xkf = out.X2.reshape(1, h, w, 3)
        idx_f2k, valid_k = matching.match(
            Xff, Xkf, out.D1, out.D2, idx_1_to_2_init=idx_init, cfg=match_cfg
        )
        res = tracker_mod.track_pose(
            track_cfg, (h, w), False,
            idx_f2k[0], valid_k[0],
            out.Q1.reshape(hw, 1), out.Q2.reshape(hw, 1),
            out.X1.reshape(hw, 3), out.C1.reshape(hw, 1),
            kf_X, kf_C, T_WCk, T_WCk,
        )
        return res.T_WCf, idx_f2k

    idx_init = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (1, hw))

    # Warmup / compile
    T, idx = frame_step(img, kf_feat, kf_pos, kf_X, kf_C, T_WCk, idx_init)
    jax.block_until_ready((T, idx))

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        T, idx = frame_step(img, kf_feat, kf_pos, kf_X, kf_C, T_WCk, idx_init)
    jax.block_until_ready((T, idx))
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
