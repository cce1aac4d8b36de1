#!/bin/bash
# Apply the Bonn groundtruth frame transform to saved estimates (reference
# scripts/transform_bonn_estimates.sh; see prepare_bonn.py).
# Usage: scripts/transform_bonn_estimates.sh <datasets_root> [--no-calib]
set -e
ROOT=${1:?usage: transform_bonn_estimates.sh <datasets_root> [--no-calib]}
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
    mkdir -p "logs/bonn_transformed/$SUB/$seq"
    python scripts/prepare_bonn.py \
        --groundtruth_path "$ROOT/bonn/$seq/groundtruth.txt" \
        --estimated_path "logs/bonn/$SUB/$seq/$seq.txt" \
        --output_path "logs/bonn_transformed/$SUB/$seq/$seq.txt"
done
