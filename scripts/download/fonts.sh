#!/usr/bin/env bash
# Fetch the published fonts mini dataset (92 MB tensor zip + 6 MB meta CSV).
set -euo pipefail
source "$(dirname "$0")/gdrive.sh"

mkdir -p dataset && cd dataset
echo "Downloading fonts dataset..."
gdrive_download 1PEukDlZ6IkEhh9XfTTMMtFOwdXOC3iKn fonts_meta.csv
gdrive_download 15xPf2FrXaHZ0bf6htZzc9ORTMGHYz9DX fonts_tensor.zip
echo "Unzipping..."
unzip -q fonts_tensor.zip
echo "Done: dataset/fonts_tensor + dataset/fonts_meta.csv"
