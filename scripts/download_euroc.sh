#!/bin/bash
# EuRoC MAV sequences (reference scripts/download_euroc.sh parity).
# Usage: scripts/download_euroc.sh [datasets_root]
set -e
ROOT=${1:-datasets}
mkdir -p "$ROOT/euroc" && cd "$ROOT/euroc"
BASE=http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset
for pair in "machine_hall MH_01_easy" "machine_hall MH_02_easy" \
            "machine_hall MH_03_medium" "machine_hall MH_04_difficult" \
            "machine_hall MH_05_difficult" \
            "vicon_room1 V1_01_easy" "vicon_room1 V1_02_medium" \
            "vicon_room1 V1_03_difficult" \
            "vicon_room2 V2_01_easy" "vicon_room2 V2_02_medium" \
            "vicon_room2 V2_03_difficult"; do
    set -- $pair
    wget -nc "$BASE/$1/$2/$2.zip"
    mkdir -p "$2" && unzip -n "$2.zip" -d "$2"
done
