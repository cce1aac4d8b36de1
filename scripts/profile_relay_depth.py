"""Isolate the relay's queue-depth effect on the per-frame SLAM chain.

Round-4 finding: the REAL loop's per-frame device chain (upload + encode +
decode + fused match/track) costs ~96 ms when the host syncs every frame,
but the same programs measure ~48 ms/frame when many frames are enqueued
before one final sync. If the gap is per-program scheduling bubbles over the
relay, deeper host pipelining (defer depth 2) recovers it; if it is a fixed
device->host pull latency, fusing programs is the only lever.

Modes: sync depth 1 (today's defer), depth 2, depth 4, depth inf.
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
from monst3r_slam_tpu.models import mast3r as model_api
from monst3r_slam_tpu.models.config import MAST3R_512
from monst3r_slam_tpu.models.convert import cast_params_for_inference
from monst3r_slam_tpu.models.init import init_params
from monst3r_slam_tpu.ops import matching, matching_tiled
from monst3r_slam_tpu.slam import tracker as tracker_mod
from monst3r_slam_tpu.slam.frame import make_keyframe_memory

H, W = 384, 512
HW = H * W
N = int(os.environ.get("N", "12"))


def main():
    params = cast_params_for_inference(
        init_params(jax.random.PRNGKey(0), MAST3R_512)
    )
    cfg = MAST3R_512
    track_cfg = tracker_mod.TrackingConfig(
        Q_conf=-1e9, C_conf=-1e9, min_match_frac=0.0
    )
    mcfg = matching.MatchingConfig(dist_thresh=1e9)
    tcfg = matching_tiled.TiledConfig()
    use_pallas = jax.default_backend() == "tpu"

    mem = make_keyframe_memory(512, H, W, cfg.enc_dim, cfg.patch_size)
    rng = np.random.default_rng(0)
    frames_np = [
        rng.standard_normal((1, H, W, 3)).astype(np.float32) * 0.5
        for _ in range(N + 4)
    ]
    kf_img = jnp.asarray(frames_np[0])
    kf_feat, kf_pos = model_api.encode(params, cfg, kf_img)
    T_i = lie.sim3_identity()
    K = jnp.eye(3)
    fN = jnp.ones((), jnp.int32)
    fS = jnp.zeros(())
    idx0 = jnp.arange(HW, dtype=jnp.int32)

    state = {}

    def reset_state():
        # fresh buffers every reset: the fused program DONATES the memory
        # arrays, so a prior run's handles are dead
        m = make_keyframe_memory(512, H, W, cfg.enc_dim, cfg.patch_size)
        state.clear()
        state.update(
            mem=(m.X_canon, m.C, m.N, m.score),
            T=T_i, idx=idx0, summaries=[],
        )

    def one_frame(i):
        """The real per-frame chain: upload -> encode -> decode -> fused."""
        img = jnp.asarray(frames_np[i])
        feat, pos = model_api.encode(params, cfg, img)
        out = model_api.decode(params, cfg, feat, pos, kf_feat, kf_pos, (H, W))
        m = state["mem"]
        (nmX, nmC, nmN, nmS, fX, fC, _fN, _fS, res, summary, idx_f2k,
         valid) = pl._match_track_and_update(
            m[0], m[1], m[2], m[3], jnp.asarray(0, jnp.int32),
            out.X1, out.C1, out.Q1, out.D1,
            out.X2, out.C2, out.Q2, out.D2,
            state["idx"],
            fX0, fC0, fN, fS, state["T"], T_i, K,
            track_cfg=track_cfg, img_size=(H, W), use_calib=False,
            fmode="weighted_pointmap", fscore="median",
            mcfg=mcfg, tcfg=tcfg, use_pallas=use_pallas, use_init=True,
        )
        state["mem"] = (nmX, nmC, nmN, nmS)
        state["T"] = res.T_WCf
        state["idx"] = idx_f2k[0]
        state["summaries"].append(summary)

    fX0 = jax.random.normal(jax.random.PRNGKey(1), (HW, 3)) + jnp.asarray(
        [0.0, 0.0, 3.0]
    )
    fC0 = jnp.full((HW, 1), 2.0)

    # warm all programs
    reset_state()
    for i in range(2):
        one_frame(i)
    np.asarray(state["summaries"][-1])

    for depth_name, depth in (("1 (sync every frame)", 1),
                              ("2", 2), ("4", 4), ("inf (one final sync)", 10**9)):
        reset_state()
        one_frame(0)
        np.asarray(state["summaries"][-1])
        t0 = time.perf_counter()
        for i in range(1, N + 1):
            one_frame(i)
            lag = len(state["summaries"]) - depth
            if lag >= 1:
                np.asarray(state["summaries"][lag - 1])
        np.asarray(state["summaries"][-1])
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"depth {depth_name:22s}: {dt:7.1f} ms/frame", flush=True)

    # pure pull RTT after a drained queue
    ts = []
    for _ in range(6):
        np.asarray(state["summaries"][-1])
        t0 = time.perf_counter()
        np.asarray(state["summaries"][-1])
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"tiny pull RTT (drained): median {np.median(ts):.2f} ms {sorted(ts)}",
          flush=True)


if __name__ == "__main__":
    main()
