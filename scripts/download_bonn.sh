#!/bin/bash
# Bonn RGB-D Dynamic dataset (reference scripts/download_bonn.sh parity).
# Usage: scripts/download_bonn.sh [datasets_root]
set -e
ROOT=${1:-datasets}
mkdir -p "$ROOT/bonn" && cd "$ROOT/bonn"
wget -nc https://www.ipb.uni-bonn.de/html/projects/rgbd_dynamic2019/rgbd_bonn_dataset.zip
unzip -n rgbd_bonn_dataset.zip
