#!/usr/bin/env python
"""ATE RMSE evaluation of saved TUM-format trajectories vs ground truth.

Replaces the reference's `evo_ape tum gt.txt est.txt -as` calls
(scripts/eval_tum.sh:46-63) with the built-in Umeyama Sim(3) alignment.

Usage: python scripts/eval_ate.py --gt groundtruth.txt --est logs/.../seq.txt
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

# Pure-numpy math: never touch the TPU relay for trajectory alignment (a
# dead relay would hang the import-time backend probe).
jax.config.update("jax_platforms", "cpu")

from monst3r_slam_tpu.app.evaluate import ate_rmse, load_tum_trajectory  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt", required=True)
    p.add_argument("--est", required=True)
    p.add_argument("--max-diff", type=float, default=0.02)
    p.add_argument("--no-scale", action="store_true")
    args = p.parse_args()

    gt_t, gt_xyz, _ = load_tum_trajectory(args.gt)
    est_t, est_xyz, _ = load_tum_trajectory(args.est)
    rmse, n = ate_rmse(
        est_t, est_xyz, gt_t, gt_xyz,
        max_diff=args.max_diff, with_scale=not args.no_scale,
    )
    print(f"ate_rmse {rmse:.6f} m  ({n} matched poses)")


if __name__ == "__main__":
    main()
