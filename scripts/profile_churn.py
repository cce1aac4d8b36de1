#!/usr/bin/env python
"""Per-frame timing of the e2e SLAM loop under keyframe churn.

Separates one-time XLA compiles (first occurrence of each (P, E) GN-solve /
edge-decode shape) from the steady-state per-frame cost: prints every frame's
wall time plus the keyframe count and edge count after it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    from monst3r_slam_tpu.app.config import load_config
    from monst3r_slam_tpu.app.pipeline import Mode, SLAMSystem
    from monst3r_slam_tpu.models.config import MAST3R_512
    from monst3r_slam_tpu.models.convert import cast_params_for_inference
    from monst3r_slam_tpu.models.init import init_params

    h, w = 384, 512
    cfg_model = MAST3R_512
    params = cast_params_for_inference(init_params(jax.random.PRNGKey(0), cfg_model))

    cfg = load_config("config/base.yaml")
    cfg["tracking"]["Q_conf"] = -1e9
    cfg["tracking"]["C_conf"] = -1e9
    cfg["tracking"]["min_match_frac"] = 0.0
    cfg["local_opt"]["Q_conf"] = -1e9
    cfg["local_opt"]["min_match_frac"] = 0.0
    cfg.setdefault("matching", {})["dist_thresh"] = 1e9
    cfg["defer_tracking_sync"] = False
    cfg["single_thread"] = os.environ.get("CHURN_SINGLE_THREAD", "0") == "1"

    slam = SLAMSystem(params=params, model_cfg=cfg_model, cfg=cfg, img_size=(h, w))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [np.sin(0.05 * xx), np.cos(0.07 * yy), np.sin(0.03 * (xx + yy))], -1
    )
    rng = np.random.default_rng(11)
    n = int(os.environ.get("CHURN_FRAMES", "16"))
    frames = [
        (base + 0.02 * i + 0.01 * rng.standard_normal((h, w, 3))).astype(np.float32)
        for i in range(n)
    ]
    # Same divergence sanitizer as bench.py stage 3/4: random weights make
    # individual GN solves legally diverge; reset between frames so every
    # frame runs the full tracking path.
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

    times = []
    for i in range(n):
        t0 = time.perf_counter()
        # keyframe every frame, pinned host-side (same compiled tracker
        # program as the default config)
        slam.process_frame(i, i / 30.0, frames[i], force_kf=True)
        t1 = time.perf_counter()
        r = sanitize()
        t2 = time.perf_counter()
        dt = t1 - t0
        times.append(dt)
        print(
            f"frame {i:2d}: {dt*1e3:8.1f} ms  sanitize {(t2-t1)*1e3:7.1f} ms "
            f"(reset={r})  n_kf={slam.n_kf:2d} "
            f"n_edges={slam.graph.n_edges:3d} mode={slam.mode.name} "
            f"stall={slam.backend_stall_s:.2f}s",
            flush=True,
        )
    t0 = time.perf_counter()
    slam.finalize()
    print(f"finalize: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    arr = np.asarray(times[2:]) * 1e3
    print(
        f"steady-ish: mean {arr.mean():.1f} ms  median {np.median(arr):.1f} ms  "
        f"min {arr.min():.1f} ms  max {arr.max():.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
