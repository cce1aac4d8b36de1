#!/bin/bash
# TUM RGB-D freiburg2/freiburg3 dynamic sequences (reference download_tum2.sh).
# Usage: scripts/download_tum2.sh [datasets_root]
set -e
ROOT=${1:-datasets}
mkdir -p "$ROOT/tum2" && cd "$ROOT/tum2"
for seq in desk_with_person; do
    f="rgbd_dataset_freiburg2_${seq}.tgz"
    wget -nc "https://cvg.cit.tum.de/rgbd/dataset/freiburg2/$f"
    tar -xzf "$f"
done
for seq in sitting_static sitting_xyz sitting_halfsphere sitting_rpy \
           walking_static walking_xyz walking_halfsphere walking_rpy; do
    f="rgbd_dataset_freiburg3_${seq}.tgz"
    wget -nc "https://cvg.cit.tum.de/rgbd/dataset/freiburg3/$f"
    tar -xzf "$f"
done
