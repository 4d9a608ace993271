#!/usr/bin/env bash
# Fetch the published icons dataset (100k pre-augmented tensor pickles, 3 GB
# zip + 9 MB meta CSV). Run from the directory that should hold
# dataset/icons_tensor + dataset/icons_meta.csv (see configs_tpu defaults).
set -euo pipefail
source "$(dirname "$0")/gdrive.sh"

mkdir -p dataset && cd dataset
echo "Downloading icons dataset..."
gdrive_download 10Zx4TB1-BEdWv1GbwcSUl2-uRFiqgUP1 icons_meta.csv
gdrive_download 1gTuO3k98u_Y1rvpSbJFbqgCf6AJi2qIA icons_tensor.zip
echo "Unzipping..."
unzip -q icons_tensor.zip
echo "Done: dataset/icons_tensor + dataset/icons_meta.csv"
