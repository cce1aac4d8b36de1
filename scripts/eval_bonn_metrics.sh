#!/bin/bash
# Post-hoc ATE over saved (transformed) Bonn trajectories (reference
# eval_bonn_metrics.sh; evo_ape -as -> eval_ate.py). Run
# scripts/transform_bonn_estimates.sh first.
# Usage: scripts/eval_bonn_metrics.sh <datasets_root> [--no-calib]
set -e
ROOT=${1:?usage: eval_bonn_metrics.sh <datasets_root> [--no-calib]}
SUB=calib; [ "${2:-}" = "--no-calib" ] && SUB=no_calib
. "$(dirname "$0")/bonn_seqs.sh"
for seq in "${SEQS[@]}"; do
    echo "=== $seq ==="
    python scripts/eval_ate.py \
        --gt "$ROOT/bonn/$seq/groundtruth.txt" \
        --est "logs/bonn_transformed/$SUB/$seq/$seq.txt"
done
