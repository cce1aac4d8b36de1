"""Reproduce bench.py's e2e stage in isolation and break down per-frame cost.

Round-4 headline question: the warm process_frame loop measures ~20 ms/frame
(scripts/profile_defer.py) but BENCH_r03's e2e stage recorded a 128 ms median
with keyframes every 5 frames. This script runs the EXACT bench stage-3 setup
(same config relaxations, same pinned buckets, same synthetic frames, same
sanitizer) with per-frame wall times and a stage ledger, under switchable
knobs:

  KF_CADENCE=5|0   (0 = never keyframe; bench uses 5)
  DEFER=0|1        (bench uses 0 = sync resolve)
  SINGLE=0|1       (1 = single_thread: backend solve inline, no worker)
  N=16 WARM=7
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from monst3r_slam_tpu.app.config import load_config
from monst3r_slam_tpu.app.pipeline import Mode, SLAMSystem
from monst3r_slam_tpu.models.config import MAST3R_512
from monst3r_slam_tpu.models.convert import cast_params_for_inference
from monst3r_slam_tpu.models.init import init_params

H, W = 384, 512


def main():
    cadence = int(os.environ.get("KF_CADENCE", "5"))
    defer = os.environ.get("DEFER", "0") == "1"
    single = os.environ.get("SINGLE", "0") == "1"
    n_e2e = int(os.environ.get("N", "16"))
    n_warm = int(os.environ.get("WARM", "7"))

    params = cast_params_for_inference(
        init_params(jax.random.PRNGKey(0), MAST3R_512)
    )

    cfg = load_config("config/base.yaml")
    cfg["tracking"]["Q_conf"] = -1e9
    cfg["tracking"]["C_conf"] = -1e9
    cfg["tracking"]["min_match_frac"] = 0.0
    cfg["local_opt"]["Q_conf"] = -1e9
    cfg["local_opt"]["min_match_frac"] = 0.0
    cfg.setdefault("matching", {})["dist_thresh"] = 1e9
    cfg["defer_tracking_sync"] = defer
    cfg["single_thread"] = single
    cfg["edge_bucket_lo"] = 4
    cfg["local_opt"]["edge_pad_lo"] = 16

    slam = SLAMSystem(params=params, model_cfg=MAST3R_512, cfg=cfg,
                      img_size=(H, W))

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = np.stack(
        [np.sin(0.05 * xx), np.cos(0.07 * yy), np.sin(0.03 * (xx + yy))], -1
    )
    frames = [
        (base + 0.02 * i + 0.01 * rng.standard_normal((H, W, 3))).astype(
            np.float32
        )
        for i in range(n_warm + n_e2e)
    ]

    def kf_flag(i):
        return (i % cadence == 0) if cadence > 0 else False

    # bench's between-frame sanitizer: random weights legally produce huge
    # GN steps; reset diverged state so every frame runs the TRACKING path
    import dataclasses as _dc

    import jax.numpy as jnp

    from monst3r_slam_tpu.core import lie

    ident = np.asarray(lie.sim3_identity())

    def sanitize():
        bad = slam.mode != Mode.TRACKING
        if not bad and slam.last_T_WC is not None:
            T = np.asarray(slam.last_T_WC)
            bad = (
                not np.isfinite(T).all()
                or float(np.linalg.norm(T[:3])) > 100.0
                or not (1e-2 < abs(float(T[7])) < 1e2)
            )
        if not bad:
            return 0
        slam.mode = Mode.TRACKING
        slam.idx_f2k = None
        slam.last_T_WC = ident.copy()
        slam._last_T_WC_dev = jnp.asarray(ident)
        mem = slam.mem
        slam.mem = _dc.replace(
            mem,
            T_WC=jnp.zeros_like(mem.T_WC).at[:, 6:].set(1.0),
            X_canon=jnp.clip(
                jnp.nan_to_num(mem.X_canon, nan=0.0, posinf=10.0, neginf=-10.0),
                -10.0, 10.0,
            ),
        )
        slam._kf_cache = None
        return 1

    for i in range(n_warm):
        t0 = time.perf_counter()
        slam.process_frame(i, i / 30.0, frames[i], force_kf=kf_flag(i))
        print(f"warm {i}: {1e3*(time.perf_counter()-t0):8.1f} ms "
              f"mode={slam.mode.name} kf={slam.n_kf}", flush=True)
        sanitize()

    slam.prof.clear()
    times, resets = [], 0
    for i in range(n_warm, len(frames)):
        t0 = time.perf_counter()
        slam.process_frame(i, i / 30.0, frames[i], force_kf=kf_flag(i))
        dt = 1e3 * (time.perf_counter() - t0)
        times.append(dt)
        print(f"frame {i}: {dt:8.1f} ms mode={slam.mode.name} kf={slam.n_kf}",
              flush=True)
        resets += sanitize()
    t0 = time.perf_counter()
    slam.finalize()
    print(f"finalize: {1e3*(time.perf_counter()-t0):.0f} ms", flush=True)
    print(
        f"cadence={cadence} defer={int(defer)} single={int(single)}: "
        f"median {np.median(times):.1f} ms  mean {np.mean(times):.1f} ms "
        f"resets={resets}",
        flush=True,
    )
    print("stage ledger (ms, median over timed frames):", flush=True)
    for k, v in slam.prof.items():
        print(f"  {k:22s} n={len(v):3d} med {np.median(v):8.2f} "
              f"mean {np.mean(v):8.2f} max {np.max(v):8.2f}", flush=True)


if __name__ == "__main__":
    main()
