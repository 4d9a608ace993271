#!/usr/bin/env bash
# Shared Google-Drive fetch helper for the published DeepSVG artifacts
# (reference: dataset/download.sh, dataset/download_fonts.sh,
# pretrained/download.sh — same file IDs, one implementation).
set -euo pipefail

gdrive_download () {
  local id="$1" out="$2" cookies
  cookies=$(mktemp)
  local confirm
  confirm=$(wget --quiet --save-cookies "$cookies" --keep-session-cookies \
    --no-check-certificate "https://docs.google.com/uc?export=download&id=${id}" -O- \
    | sed -rn 's/.*confirm=([0-9A-Za-z_]+).*/\1/p')
  wget --load-cookies "$cookies" \
    "https://docs.google.com/uc?export=download&confirm=${confirm}&id=${id}" -O "$out"
  rm -f "$cookies"
}
