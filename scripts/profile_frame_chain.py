"""Per-frame program-chain ablation on the real chip.

The tracking hot path currently dispatches THREE programs per frame
(encode -> pair decode -> fused match+track+update). Over the axon relay
each program dispatch costs a host->device round trip, and the frame's
decision summary is only host-ready after the LAST program completes, so
per-frame latency = sum(device times) + (n_programs - 1) * inter-program
gaps + 1 RTT. This script measures, with real ViT-L dims and bf16 params:

  A. 3 programs (current production chain)
  B. 2 programs (encode+decode in one jit, match+track separate)
  C. 1 program (everything fused)

for both SERIAL latency (block on every frame's summary) and DEPTH-2
PIPELINED throughput (block only on frame t-2's summary — the production
defer_tracking_sync=2 discipline).
"""

import os
import sys
import time
from collections import deque
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.app import pipeline as pl
from monst3r_slam_tpu.core import lie
from monst3r_slam_tpu.models import mast3r as model_api
from monst3r_slam_tpu.models import croco, heads
from monst3r_slam_tpu.models.config import MAST3R_512
from monst3r_slam_tpu.models.convert import cast_params_for_inference
from monst3r_slam_tpu.models.init import init_params
from monst3r_slam_tpu.ops import matching, matching_tiled
from monst3r_slam_tpu.slam import tracker as tracker_mod
from monst3r_slam_tpu.slam.frame import make_keyframe_memory

H, W = 384, 512
HW = H * W
CAP = int(os.environ.get("CAP", "512"))
N = int(os.environ.get("N", "30"))


def bench(run_frame, summaries_lag, n=N, warmup=4, reps=3):
    """run_frame(k) -> summary array. Block on the summary `summaries_lag`
    frames behind (0 = serial). Returns best-of-reps ms/frame."""
    best = np.inf
    for _ in range(reps):
        q = deque()
        for k in range(warmup):
            q.append(run_frame(k))
            if len(q) > summaries_lag:
                np.asarray(q.popleft())
        while q:
            np.asarray(q.popleft())
        t0 = time.perf_counter()
        q = deque()
        for k in range(n):
            q.append(run_frame(k))
            if len(q) > summaries_lag:
                np.asarray(q.popleft())
        while q:
            np.asarray(q.popleft())
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    cfg = MAST3R_512
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    params = cast_params_for_inference(init_params(ks[0], cfg))
    imgs = [
        jax.random.normal(ks[1 + (i % 4)], (1, H, W, 3)) * 0.4
        for i in range(4)
    ]
    n_tok = (H // cfg.patch_size) * (W // cfg.patch_size)
    kf_feat, kf_pos = model_api.encode(params, cfg, imgs[0])
    jax.block_until_ready(kf_feat)

    track_cfg = tracker_mod.TrackingConfig(
        Q_conf=-1e9, C_conf=-1e9, min_match_frac=0.0
    )
    mcfg = matching.MatchingConfig(dist_thresh=1e9)
    tcfg = matching_tiled.TiledConfig()
    use_pallas = jax.default_backend() == "tpu"

    def fresh_mem():
        # each variant donates these buffers into its program chain; a
        # shared copy would be consumed by the first variant
        m = make_keyframe_memory(CAP, H, W, 1024, 16)
        return (m.X_canon, m.C, m.N, m.score)

    kf_idx = jnp.asarray(0, jnp.int32)
    fX = jax.random.normal(ks[5], (HW, 3)) + jnp.asarray([0.0, 0.0, 3.0])
    fC = jnp.full((HW, 1), 2.0)
    fN = jnp.ones((), jnp.int32)
    fS = jnp.zeros(())
    T_i = lie.sim3_identity()
    K = jnp.eye(3)
    idx0 = jnp.arange(HW, dtype=jnp.int32)

    mtu_kw = dict(
        track_cfg=track_cfg, img_size=(H, W), use_calib=False,
        fmode="weighted_pointmap", fscore="median",
        mcfg=mcfg, tcfg=tcfg, use_pallas=use_pallas, use_init=True,
    )

    # ---- A: 3 programs (production today) --------------------------------
    stateA = {"mem": fresh_mem(), "idx": idx0}

    def frameA(k):
        feat, pos = model_api.encode(params, cfg, imgs[k % 4])
        out = model_api.decode(params, cfg, feat, pos, kf_feat, kf_pos, (H, W))
        m = stateA["mem"]
        (nmX, nmC, nmN, nmS, _fX, _fC, _fN, _fS, res, summary,
         idx_f2k, valid) = pl._match_track_and_update(
            m[0], m[1], m[2], m[3], kf_idx,
            out.X1, out.C1, out.Q1, out.D1,
            out.X2, out.C2, out.Q2, out.D2,
            stateA["idx"], fX, fC, fN, fS, T_i, T_i, K, **mtu_kw,
        )
        stateA["mem"] = (nmX, nmC, nmN, nmS)
        stateA["idx"] = idx_f2k
        try:
            summary.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        return summary

    print(f"A serial   (3 prog): {bench(frameA, 0):8.2f} ms", flush=True)
    print(f"A depth-2  (3 prog): {bench(frameA, 2):8.2f} ms", flush=True)

    # ---- B: 2 programs (encode+decode in one jit) -------------------------
    @partial(jax.jit, static_argnames=("mcfg_", "shape"))
    def enc_dec(p, img, kff, kfp, mcfg_, shape):
        feat, pos = croco.encode_image(p, mcfg_, img, jnp.bfloat16)
        h, w = shape
        n_h, n_w = h // mcfg_.patch_size, w // mcfg_.patch_size
        dec1, dec2 = croco.decode_pair(p, mcfg_, feat, pos, kff, kfp, jnp.bfloat16)
        out1 = heads.head_forward(p["head1"], mcfg_, dec1, n_h, n_w)
        out2 = heads.head_forward(p["head2"], mcfg_, dec2, n_h, n_w)
        return feat, pos, model_api.PairOutput(
            out1.pts3d, out1.conf, out1.desc, out1.desc_conf,
            out2.pts3d, out2.conf, out2.desc, out2.desc_conf,
        )

    stateB = {"mem": fresh_mem(), "idx": idx0}

    def frameB(k):
        feat, pos, out = enc_dec(params, imgs[k % 4], kf_feat, kf_pos, cfg, (H, W))
        m = stateB["mem"]
        (nmX, nmC, nmN, nmS, _fX, _fC, _fN, _fS, res, summary,
         idx_f2k, valid) = pl._match_track_and_update(
            m[0], m[1], m[2], m[3], kf_idx,
            out.X1, out.C1, out.Q1, out.D1,
            out.X2, out.C2, out.Q2, out.D2,
            stateB["idx"], fX, fC, fN, fS, T_i, T_i, K, **mtu_kw,
        )
        stateB["mem"] = (nmX, nmC, nmN, nmS)
        stateB["idx"] = idx_f2k
        try:
            summary.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        return summary

    print(f"B serial   (2 prog): {bench(frameB, 0):8.2f} ms", flush=True)
    print(f"B depth-2  (2 prog): {bench(frameB, 2):8.2f} ms", flush=True)

    # ---- C: 1 fused program -----------------------------------------------
    @partial(
        jax.jit,
        static_argnames=tuple(mtu_kw.keys()) + ("model_cfg",),
        donate_argnums=(4, 5, 6, 7),
    )
    def fused_frame(p, img, kff, kfp, mem_X, mem_C, mem_N, mem_S, kfi,
                    idx_init, frame_X, frame_C, frame_N, frame_S,
                    T_prev, T_k, K_, model_cfg, **kw):
        feat, pos = croco.encode_image(p, model_cfg, img, jnp.bfloat16)
        h, w = kw["img_size"]
        n_h, n_w = h // model_cfg.patch_size, w // model_cfg.patch_size
        dec1, dec2 = croco.decode_pair(p, model_cfg, feat, pos, kff, kfp, jnp.bfloat16)
        out1 = heads.head_forward(p["head1"], model_cfg, dec1, n_h, n_w)
        out2 = heads.head_forward(p["head2"], model_cfg, dec2, n_h, n_w)
        outs = pl._match_track_and_update.__wrapped__(
            mem_X, mem_C, mem_N, mem_S, kfi,
            out1.pts3d, out1.conf, out1.desc_conf, out1.desc,
            out2.pts3d, out2.conf, out2.desc_conf, out2.desc,
            idx_init, frame_X, frame_C, frame_N, frame_S,
            T_prev, T_k, K_, **kw,
        )
        return (feat, pos) + outs

    stateC = {"mem": fresh_mem(), "idx": idx0}

    def frameC(k):
        m = stateC["mem"]
        (feat, pos, nmX, nmC, nmN, nmS, _fX, _fC, _fN, _fS, res, summary,
         idx_f2k, valid) = fused_frame(
            params, imgs[k % 4], kf_feat, kf_pos,
            m[0], m[1], m[2], m[3], kf_idx,
            stateC["idx"], fX, fC, fN, fS, T_i, T_i, K,
            model_cfg=cfg, **mtu_kw,
        )
        stateC["mem"] = (nmX, nmC, nmN, nmS)
        stateC["idx"] = idx_f2k
        try:
            summary.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        return summary

    t0 = time.perf_counter()
    try:
        frameC(0)
        print(f"C compile: {time.perf_counter()-t0:.1f} s", flush=True)
    except Exception as e:
        print(f"C FAILED to compile after {time.perf_counter()-t0:.1f} s: "
              f"{type(e).__name__}: {e}", flush=True)
        return
    print(f"C serial   (1 prog): {bench(frameC, 0):8.2f} ms", flush=True)
    print(f"C depth-2  (1 prog): {bench(frameC, 2):8.2f} ms", flush=True)
    print(f"C depth-3  (1 prog): {bench(frameC, 3):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
