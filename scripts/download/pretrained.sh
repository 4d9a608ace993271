#!/usr/bin/env bash
# Fetch the published pretrained checkpoints (41 MB .pth.tar each). They load
# directly via deepsvg_tpu.models.torch_import.load_torch_checkpoint /
# deepsvg_tpu.inference.load_session.
set -euo pipefail
source "$(dirname "$0")/gdrive.sh"

mkdir -p pretrained && cd pretrained
echo "Downloading pretrained models..."
gdrive_download 1tsVx_cnFunSf5vvPWPVTjZ84IQC2pIDm hierarchical_ordered.pth.tar
gdrive_download 11KBUWfexw3LDvSFOVxy072_VCFYKm3L- hierarchical_ordered_fonts.pth.tar
echo "Done: pretrained/*.pth.tar"
