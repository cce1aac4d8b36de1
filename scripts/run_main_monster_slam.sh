#!/bin/bash
# Dynamic MonST3R pipeline on Bonn person_tracking
# (reference scripts/run_main_monster_slam.sh, no SLURM)
set -e
ROOT=${1:?usage: run_main_monster_slam.sh <datasets_root>}
python main_monster_slam.py \
    --dataset "$ROOT/bonn/rgbd_bonn_person_tracking" \
    --config config/calib.yaml
