"""Accuracy ablations of the TPU-first deviations (VERDICT r3 item 4).

Each deviation from the reference's numerics has a correctness test; this
script quantifies its ATE cost on the adversarial synthetic harness
(NoisyOracleSLAM: depth noise, 6% gross outliers, stochastic confidences,
retrieval-driven loop closures) over a LONG loop trajectory:

  1. local_opt.pixel_subsample 1 vs 4   (reference accumulates every pixel,
     gn_kernels.cu:926; the TPU default subsamples 4x for solve throughput)
  2. matcher mode tiled/crop-48 vs 'lm' (reference-semantics iterative
     projection; crop bounds the tiled matcher's search window)
  3. local_opt.solver device-f32 vs host-f64 (reference: Eigen f64 CPU LLT,
     gn_kernels.cu:57-159)

Run on the CPU backend (the harness bypasses the neural model). Results go
in NOTES_r4.md. Env: N_FRAMES=100 SEEDS=2
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

N_FRAMES = int(os.environ.get("N_FRAMES", "100"))
SEEDS = int(os.environ.get("SEEDS", "2"))


def run(n_frames, seed, overrides):
    import jax.numpy as jnp

    from monst3r_slam_tpu.app.config import load_config
    from monst3r_slam_tpu.app.evaluate import ate_rmse
    from monst3r_slam_tpu.core import lie
    from monst3r_slam_tpu.models.config import TINY
    from monst3r_slam_tpu.slam import retrieval as retrieval_mod
    from test_ate_regression import (
        H, W, NoisyOracleSLAM, _loop_trajectory,
    )

    cfg = load_config("config/base.yaml")
    cfg["tracking"]["Q_conf"] = 1.2
    cfg["tracking"]["C_conf"] = 1.2
    cfg["local_opt"]["Q_conf"] = 1.2
    cfg["tracking"]["match_frac_thresh"] = 0.925
    cfg["single_thread"] = True
    cfg["retrieval"] = {"k": 3, "min_thresh": 1e-4}
    for path, v in overrides.items():
        d = cfg
        keys = path.split(".")
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = v

    slam = NoisyOracleSLAM(
        params={}, model_cfg=TINY, cfg=cfg, img_size=(H, W), kf_capacity=256,
        retrieval_params=retrieval_mod.init_retrieval_params(
            jax.random.PRNGKey(1), TINY.enc_dim, hdims=(32,)
        ),
        retrieval_db=retrieval_mod.ASMKDatabase(None, n_words=64),
    )
    slam._noise = np.random.default_rng(100 + seed)

    gt = _loop_trajectory(n_frames)
    img = np.zeros((H, W, 3), np.float32)
    for i, T in enumerate(gt):
        slam.register_frame(T)
        slam.process_frame(i, float(i) / 30.0, img)
    slam.finalize()
    _, T_all = slam.full_trajectory()
    est_xyz = np.stack([np.asarray(lie.sim3_to_se3(T))[:3] for T in T_all])
    gt_xyz = np.stack([T[:3] for T in gt])
    t = np.arange(n_frames, dtype=np.float64)
    rmse, _ = ate_rmse(t, est_xyz, t, gt_xyz)
    return rmse, int(slam.n_kf)


ABLATIONS = [
    ("defaults (subsample=4, tiled, device-f32)", {}),
    ("pixel_subsample=1", {"local_opt.pixel_subsample": 1}),
    ("pixel_subsample=8", {"local_opt.pixel_subsample": 8}),
    ("matcher=lm (reference semantics)", {"matching.mode": "lm"}),
    ("solver=host-f64", {"local_opt.solver": "host"}),
    ("defer_tracking_sync=1 + async", {"defer_tracking_sync": 1,
                                       "single_thread": False}),
    ("defer_tracking_sync=2 + async (prod default)",
     {"defer_tracking_sync": 2, "single_thread": False}),
]


def main():
    rows = os.environ.get("ROWS", "")
    ablations = ABLATIONS
    if rows:
        keys = [r.strip() for r in rows.split(",") if r.strip()]
        ablations = [
            (n, o) for n, o in ABLATIONS if any(k in n for k in keys)
        ]
    print(f"n_frames={N_FRAMES} seeds={SEEDS}", flush=True)
    for name, overrides in ablations:
        rmses, kfs = [], []
        t0 = time.perf_counter()
        for s in range(SEEDS):
            rmse, n_kf = run(N_FRAMES, s, overrides)
            rmses.append(rmse)
            kfs.append(n_kf)
        print(
            f"{name:45s} ATE RMSE {np.mean(rmses):.5f} "
            f"(+/- {np.std(rmses):.5f}, seeds={rmses}) "
            f"kf={kfs} [{time.perf_counter()-t0:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
