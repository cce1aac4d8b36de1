#!/bin/bash
# Post-hoc ATE over saved TUM dynamic trajectories (reference
# eval_tum2_metrics.sh; evo_ape -as -> eval_ate.py).
# Usage: scripts/eval_tum2_metrics.sh <datasets_root> [--no-calib]
set -e
ROOT=${1:?usage: eval_tum2_metrics.sh <datasets_root> [--no-calib]}
SUB=calib; [ "${2:-}" = "--no-calib" ] && SUB=no_calib
. "$(dirname "$0")/tum2_seqs.sh"
for seq in "${SEQS[@]}"; do
    echo "=== $seq ==="
    python scripts/eval_ate.py \
        --gt "$ROOT/tum2/$seq/groundtruth.txt" \
        --est "logs/tum2/$SUB/$seq/$seq.txt"
done
