#!/bin/bash
# ETH3D SLAM training sequences (reference scripts/download_eth3d.sh parity).
# Usage: scripts/download_eth3d.sh [datasets_root]
set -e
ROOT=${1:-datasets}
mkdir -p "$ROOT/eth3d" && cd "$ROOT/eth3d"
wget -nc https://www.eth3d.net/slam_datasets/training_mono.zip
unzip -n training_mono.zip
