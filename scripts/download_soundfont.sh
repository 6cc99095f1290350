#!/usr/bin/env bash
# Fetch the FluidR3 GM soundfont (for MIDI->WAV synthesis with fluidsynth).
# Mirrors the reference's download_soundfont.sh: extracts the .sf2 from the
# Ubuntu fluid-soundfont-gm package.
set -euo pipefail
DEST_DIR="${1:-soundfonts}"
mkdir -p "$DEST_DIR"
URL="http://archive.ubuntu.com/ubuntu/pool/universe/f/fluid-soundfont/fluid-soundfont-gm_3.1-5.3_all.deb"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
echo "Downloading fluid-soundfont-gm..."
wget -q -O "$TMP/fs.deb" "$URL"
cd "$TMP"
ar x fs.deb
if [ -f data.tar.zst ]; then
    unzstd -q data.tar.zst
    tar xf data.tar
elif [ -f data.tar.xz ]; then
    tar xf data.tar.xz
fi
cp usr/share/sounds/sf2/FluidR3_GM.sf2 "$OLDPWD/$DEST_DIR/"
echo "Soundfont saved to $DEST_DIR/FluidR3_GM.sf2"
