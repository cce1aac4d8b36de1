#!/bin/bash
# Apply the Bonn groundtruth frame transform to saved estimates (reference
# scripts/transform_bonn_estimates.sh; see prepare_bonn.py).
# Usage: scripts/transform_bonn_estimates.sh <datasets_root> [--no-calib]
set -e
ROOT=${1:?usage: transform_bonn_estimates.sh <datasets_root> [--no-calib]}
SUB=calib; [ "${2:-}" = "--no-calib" ] && SUB=no_calib
. "$(dirname "$0")/bonn_seqs.sh"
for seq in "${SEQS[@]}"; do
    echo "=== $seq ==="
    mkdir -p "logs/bonn_transformed/$SUB/$seq"
    python scripts/prepare_bonn.py \
        --groundtruth_path "$ROOT/bonn/$seq/groundtruth.txt" \
        --estimated_path "logs/bonn/$SUB/$seq/$seq.txt" \
        --output_path "logs/bonn_transformed/$SUB/$seq/$seq.txt"
done
