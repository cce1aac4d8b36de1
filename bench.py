#!/usr/bin/env python
"""Benchmark: end-to-end per-frame tracking compute on one TPU chip.

Measures the full per-frame SLAM tracking path of the flagship model
(MASt3R ViT-L, 512x384, bf16 matmuls): encoder + dual decoder + DPT/catMLP
heads + iterative-projection matching + descriptor refinement + Sim(3) GN
tracking. Reference baseline: 0.16-0.19 FPS end-to-end for the dynamic
MonST3R pipeline on a >=12GB CUDA GPU (BASELINE.md).

Timing methodology: the whole K-frame loop runs as ONE jitted `lax.scan`
with a data dependency between frames, and the result is fetched to host —
async-dispatch-proof (plain block_until_ready under-reports on this stack).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

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

    kf_feat, kf_pos = model_api.encode(params, cfg, img)
    kf_X = jax.random.normal(key, (hw, 3)) + jnp.asarray([0.0, 0.0, 3.0])
    kf_C = jnp.full((hw, 1), 2.0)
    T_WCk = lie.sim3_identity()

    def frame_step(carry, _):
        T_prev, idx_prev = carry
        # Data dependency: perturb the input image by the previous pose
        img_t = img + 1e-6 * T_prev[0]
        feat, pos = model_api.encode(params, cfg, img_t)
        out = model_api.decode(params, cfg, feat, pos, kf_feat, kf_pos, (h, w))
        Xff = out.X1.reshape(1, h, w, 3)
        Xkf = out.X2.reshape(1, h, w, 3)
        idx_f2k, valid_k = matching.match(
            Xff, Xkf, out.D1, out.D2, idx_1_to_2_init=idx_prev, cfg=match_cfg
        )
        res = tracker_mod.track_pose(
            track_cfg, (h, w), False,
            idx_f2k[0], valid_k[0],
            out.Q1.reshape(hw, 1), out.Q2.reshape(hw, 1),
            out.X1.reshape(hw, 3), out.C1.reshape(hw, 1),
            kf_X, kf_C, T_WCk, T_WCk,
        )
        return (res.T_WCf, idx_f2k), res.match_frac

    K_FRAMES = 8

    @jax.jit
    def run_frames(T0, idx0):
        (T, idx), fracs = jax.lax.scan(
            frame_step, (T0, idx0), None, length=K_FRAMES
        )
        return T, fracs

    idx0 = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (1, hw))

    # Warmup / compile, then fetch to force completion
    T, fracs = run_frames(T_WCk, idx0)
    np.asarray(T)

    t0 = time.perf_counter()
    T, fracs = run_frames(T_WCk, idx0)
    np.asarray(T), np.asarray(fracs)
    dt = (time.perf_counter() - t0) / K_FRAMES
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "tracking_fps_512x384_vitl",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
