#!/bin/bash
# Post-hoc ATE over saved (transformed) Bonn trajectories (reference
# eval_bonn_metrics.sh; evo_ape -as -> eval_ate.py). Run
# scripts/transform_bonn_estimates.sh first.
# Usage: scripts/eval_bonn_metrics.sh <datasets_root> [--no-calib]
set -e
ROOT=${1:?usage: eval_bonn_metrics.sh <datasets_root> [--no-calib]}
SUB=calib; [ "${2:-}" = "--no-calib" ] && SUB=no_calib
SEQS=(rgbd_bonn_removing_nonobstructing_box2 rgbd_bonn_removing_obstructing_box \
      rgbd_bonn_moving_nonobstructing_box2 rgbd_bonn_crowd rgbd_bonn_kidnapping_box \
      rgbd_bonn_balloon rgbd_bonn_placing_nonobstructing_box rgbd_bonn_synchronous \
      rgbd_bonn_static_close_far rgbd_bonn_synchronous2 rgbd_bonn_moving_nonobstructing_box \
      rgbd_bonn_balloon_tracking rgbd_bonn_removing_nonobstructing_box \
      rgbd_bonn_moving_obstructing_box rgbd_bonn_person_tracking \
      rgbd_bonn_placing_nonobstructing_box2 rgbd_bonn_crowd2 rgbd_bonn_person_tracking2 \
      rgbd_bonn_crowd3 rgbd_bonn_placing_nonobstructing_box3 rgbd_bonn_balloon2 \
      rgbd_bonn_moving_obstructing_box2 rgbd_bonn_balloon_tracking2 \
      rgbd_bonn_placing_obstructing_box rgbd_bonn_kidnapping_box2)
for seq in "${SEQS[@]}"; do
    echo "=== $seq ==="
    python scripts/eval_ate.py \
        --gt "$ROOT/bonn/$seq/groundtruth.txt" \
        --est "logs/bonn_transformed/$SUB/$seq/$seq.txt"
done
