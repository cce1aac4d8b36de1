"""Profile the REAL process_frame loop on TPU (one process).

Round-3 finding: the staged bench programs run ~48 ms/frame, but the real
SLAMSystem loop measured ~700 ms/frame at kf_capacity=512. This script
isolates the cause: per-frame wall time vs kf_capacity, with per-frame
prints, one SLAMSystem at a time (multiple live instances OOM the chip).

Env: CAPS="8,64,512" DEFER=both N_FRAMES=14
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from monst3r_slam_tpu.app.config import load_config
from monst3r_slam_tpu.app.pipeline import SLAMSystem
from monst3r_slam_tpu.models.config import MAST3R_512
from monst3r_slam_tpu.models.convert import cast_params_for_inference
from monst3r_slam_tpu.models.init import init_params

H, W = 384, 512
N_FRAMES = int(os.environ.get("N_FRAMES", "14"))
N_WARM = 4


def synth_frames(n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = np.stack(
        [np.sin(0.05 * xx), np.cos(0.07 * yy), np.sin(0.03 * (xx + yy))], -1
    )
    return [
        (base + 0.02 * i + 0.01 * rng.standard_normal((H, W, 3))).astype(
            np.float32
        )
        for i in range(n)
    ]


def run(params, frames, defer, cap):
    cfg = load_config("config/base.yaml")
    cfg["single_thread"] = False
    cfg["defer_tracking_sync"] = defer
    cfg["tracking"]["Q_conf"] = -1e9
    cfg["tracking"]["C_conf"] = -1e9
    cfg["tracking"]["min_match_frac"] = 0.0
    cfg["local_opt"]["Q_conf"] = -1e9
    cfg["local_opt"]["min_match_frac"] = 0.0
    s = SLAMSystem(
        params=params, model_cfg=MAST3R_512, cfg=cfg, img_size=(H, W),
        kf_capacity=cap,
    )
    times = []
    for i, img in enumerate(frames):
        t0 = time.perf_counter()
        s.process_frame(i, i / 30.0, img)
        times.append((time.perf_counter() - t0) * 1e3)
    t0 = time.perf_counter()
    s.finalize()
    fin = (time.perf_counter() - t0) * 1e3
    tail = times[N_WARM:]
    print(
        f"cap={cap:4d} defer={int(defer)}: tail mean {np.mean(tail):8.2f} ms "
        f"med {np.median(tail):8.2f} ms  (fin {fin:.0f} ms, kf={int(s.mem.count)})",
        flush=True,
    )
    print("  per-frame:", " ".join(f"{t:.0f}" for t in times), flush=True)
    del s
    gc.collect()
    return np.median(tail)


def main():
    params = cast_params_for_inference(init_params(jax.random.PRNGKey(0), MAST3R_512))
    frames = synth_frames(N_FRAMES)
    caps = [int(c) for c in os.environ.get("CAPS", "8,64,512").split(",")]
    defer_env = os.environ.get("DEFER", "both")
    defers = [False, True] if defer_env == "both" else [defer_env == "1"]
    for cap in caps:
        for defer in defers:
            run(params, frames, defer, cap)


if __name__ == "__main__":
    main()
