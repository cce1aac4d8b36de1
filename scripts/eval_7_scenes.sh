#!/bin/bash
# 7-Scenes evaluation sweep (reference scripts/eval_7_scenes.sh, no SLURM)
# Usage: scripts/eval_7_scenes.sh <datasets_root> [--no-calib]
set -e
ROOT=${1:?usage: eval_7_scenes.sh <datasets_root> [--no-calib]}
CONFIG=config/eval_calib.yaml
[ "$2" = "--no-calib" ] && CONFIG=config/eval_no_calib.yaml

SEQS=(chess fire heads office pumpkin redkitchen stairs)

for seq in "${SEQS[@]}"; do
    echo "=== $seq ==="
    python main.py --dataset "$ROOT/7-scenes/$seq/seq-01" --config "$CONFIG" --no-viz
    python scripts/eval_ate.py \
        --gt "$ROOT/7-scenes/$seq/seq-01/groundtruth.txt" \
        --est "logs/seq-01.txt" | tee -a logs/7scenes_ate_rmse.txt
done
