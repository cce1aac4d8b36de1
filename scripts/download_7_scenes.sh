#!/bin/bash
# Microsoft 7-Scenes sequences (reference scripts/download_7_scenes.sh parity).
# Usage: scripts/download_7_scenes.sh [datasets_root]
set -e
ROOT=${1:-datasets}
mkdir -p "$ROOT/7-scenes" && cd "$ROOT/7-scenes"
BASE=http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8
for scene in chess fire heads office pumpkin redkitchen stairs; do
    wget -nc "$BASE/$scene.zip"
    unzip -n "$scene.zip"
done
