#!/bin/bash
# One-command pretrained-weight landing (round-2 VERDICT next-step #10):
# the moment egress exists, this downloads the torchvision/smp artifacts
# listed in tools/weights_manifest.json, verifies the sha256 prefix that
# torchvision embeds in its filenames, ports each to a JAX npz with
# tools/port_weights.py, and drops it on the models/weights/ auto-discovery
# path — no new code needed for the real quality-gate numbers to land.
#
# Usage:  bash tools/fetch_and_port.sh [download_dir]
# Exit status 0 only if every torchvision artifact landed; the smp B7
# checkpoint has no stable direct URL (see manifest) and is reported but
# not fatal. Every attempt is appended to tools/fetch_and_port.log.

set -u
cd "$(dirname "$0")/.."
DL="${1:-/tmp/weights_dl}"
mkdir -p "$DL"
LOG=tools/fetch_and_port.log
WDIR=iris_style_transfer_tpu/models/weights
ok=0

note() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$LOG"; }

fetch_port() { # kind url sha8 out
  local kind=$1 url=$2 sha8=$3 out=$4
  local f="$DL/$(basename "$url")"
  if [ ! -s "$f" ]; then
    note "fetching $kind from $url"
    if ! curl -fSL --connect-timeout 15 -o "$f" "$url" 2>>"$LOG"; then
      note "FAILED to fetch $kind (no egress?)"
      return 1
    fi
  fi
  if [ -n "$sha8" ]; then
    local got
    got=$(sha256sum "$f" | cut -c1-8)
    if [ "$got" != "$sha8" ]; then
      note "CHECKSUM MISMATCH for $kind: got $got want $sha8 — refusing to port"
      return 1
    fi
  fi
  note "porting $kind -> $out"
  python tools/port_weights.py "$kind" "$f" "$out" >>"$LOG" 2>&1 || {
    note "PORT FAILED for $kind"; return 1; }
  # record the ported npz's sha256 so load_pretrained validates future
  # loads of this artifact (models/pretrained.py:verify_manifest_checksum)
  python -c "from iris_style_transfer_tpu.models.pretrained import record_npz_checksum; record_npz_checksum('$kind', '$out')" >>"$LOG" 2>&1 \
    || note "WARNING: could not record npz checksum for $kind"
  note "OK $kind"
}

fetch_port vgg19 https://download.pytorch.org/models/vgg19-dcbb9e9d.pth \
  dcbb9e9d "$WDIR/vgg19.npz" && ok=$((ok+1))
fetch_port resnet50 https://download.pytorch.org/models/resnet50-11ad3fa6.pth \
  11ad3fa6 "$WDIR/resnet50.npz" && ok=$((ok+1))

# smp Unet(efficientnet-b7): no stable direct URL published (reference
# readme.md:35 points at the github repo). If you obtained the file
# manually, port it with:
#   python tools/port_weights.py efficientnet_unet <ckpt.pt> $WDIR/unet_efficientnet-b7.npz
if [ -s "$DL/unet_efficientnet-b7.pt" ]; then
  note "porting manually supplied smp B7 checkpoint"
  python tools/port_weights.py efficientnet_unet "$DL/unet_efficientnet-b7.pt" \
    "$WDIR/unet_efficientnet-b7.npz" >>"$LOG" 2>&1 \
    && python -c "from iris_style_transfer_tpu.models.pretrained import record_npz_checksum; record_npz_checksum('efficientnet_unet', '$WDIR/unet_efficientnet-b7.npz')" >>"$LOG" 2>&1 \
    && note "OK efficientnet_unet"
else
  note "smp B7 checkpoint not present in $DL (manual download required, see manifest)"
fi

note "done: $ok/2 torchvision artifacts landed"
[ "$ok" -eq 2 ]
