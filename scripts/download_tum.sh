#!/bin/bash
# TUM RGB-D freiburg1 sequences (reference scripts/download_tum.sh parity).
# Usage: scripts/download_tum.sh [datasets_root]
set -e
ROOT=${1:-datasets}
mkdir -p "$ROOT/tum" && cd "$ROOT/tum"
for seq in 360 floor desk desk2 room plant teddy xyz rpy; do
    f="rgbd_dataset_freiburg1_${seq}.tgz"
    wget -nc "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/$f"
    tar -xzf "$f"
done
