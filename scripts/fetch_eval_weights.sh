#!/usr/bin/env bash
# Fetch the three pretrained torch checkpoints the eval metrics need
# (SSFID / SIFID / LPIPS-AlexNet).  This container has NO egress, so the
# script documents the sources and verifies integrity; run it on any
# machine with network access, then copy the weights dir over:
#
#   scripts/fetch_eval_weights.sh [WEIGHTS_DIR]   # default: ./eval_weights
#   scripts/verify_metric_parity.sh [WEIGHTS_DIR] # full real-weight parity
#
# Sources (same ones the reference uses):
#  * Clsshapenet_128.pth — pretrained 3D shapenet classifier for SSFID
#    (`/root/reference/evaluation/ssfid.py:87-89`).  Google Drive id
#    1HjnDudrXsNY4CYhIGhH4Q0r3-NBnBaiC (from the Sin3DM README); Drive
#    needs the confirm-token dance, handled below via the uc endpoint.
#    No official sha256 is published — the expected file size is ~223MB
#    and scripts/verify_metric_parity.sh validates it structurally
#    (state-dict keys + activation parity).
#  * inception_v3_google-0cc3c7bd.pth — torchvision InceptionV3
#    IMAGENET1K_V1, used by SIFID (`evaluation/inception.py:60`).
#    The 8-hex suffix is the file's sha256 prefix (torchvision convention).
#  * alexnet-owt-7be5be79.pth — torchvision AlexNet IMAGENET1K_V1,
#    used by LPIPS (`evaluation/lpips.py:26`).
set -euo pipefail

DIR=${1:-eval_weights}
mkdir -p "$DIR"

fetch() { # url out sha256prefix
    local url=$1 out=$2 sha=$3
    if [ ! -f "$out" ]; then
        echo "fetching $out ..."
        curl -fSL "$url" -o "$out"
    fi
    if [ -n "$sha" ]; then
        local got
        got=$(sha256sum "$out" | cut -c1-${#sha})
        if [ "$got" != "$sha" ]; then
            echo "sha256 mismatch for $out: got $got want $sha" >&2
            exit 1
        fi
    fi
    echo "ok: $out"
}

fetch "https://download.pytorch.org/models/inception_v3_google-0cc3c7bd.pth" \
      "$DIR/inception_v3_google-0cc3c7bd.pth" "0cc3c7bd"
fetch "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth" \
      "$DIR/alexnet-owt-7be5be79.pth" "7be5be79"

CLS="$DIR/Clsshapenet_128.pth"
if [ ! -f "$CLS" ]; then
    echo "fetching Clsshapenet_128.pth from Google Drive ..."
    GDID=1HjnDudrXsNY4CYhIGhH4Q0r3-NBnBaiC
    # Drive large-file confirm flow; gdown does this more robustly if present
    if command -v gdown >/dev/null 2>&1; then
        gdown "$GDID" -O "$CLS"
    else
        curl -fsSL -c /tmp/gdcookies \
            "https://drive.google.com/uc?export=download&id=$GDID" \
            -o /tmp/gdresp || true
        CONFIRM=$(grep -o 'confirm=[0-9A-Za-z_-]*' /tmp/gdresp | head -1 \
                  | cut -d= -f2 || true)
        curl -fSL -b /tmp/gdcookies \
            "https://drive.google.com/uc?export=download&confirm=${CONFIRM:-t}&id=$GDID" \
            -o "$CLS"
    fi
fi
python - "$CLS" <<'EOF'
import sys, torch
sd = torch.load(sys.argv[1], map_location="cpu")
keys = set(sd.keys())
assert any("conv" in k or "main" in k for k in keys), sorted(keys)[:8]
print(f"ok: {sys.argv[1]} ({len(keys)} tensors)")
EOF

echo "all eval weights present in $DIR"
echo "next: scripts/verify_metric_parity.sh $DIR"
