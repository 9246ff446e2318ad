#!/bin/bash
# VQGAN quality row #2 (VERDICT r4 task 6, round-3 task 8 remainder):
# train the in-framework VQ tokenizer at 128px with a 1024-code book —
# halfway between the round-3 64px/512-code row and the released
# 256px/8192 config (reference vqgan.py:59-102) — on the real
# photographs available offline, and report round-trip PSNR + codebook
# usage through the released-pickle-layout load path.
#
# Geometry matches the released tokenizer's 16x16-latent contract:
# 4 channel mults = 3 downsamples, 128px -> 16x16 = 256 codes/frame.
#
# Usage: bash scripts/run_vqgan_128px.sh [WORKDIR]
set -eu
WORK=${1:-/tmp/vq128}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p "$WORK/imgs"

python - "$WORK/imgs" <<'EOF'
# gather the real photographs shipped inside installed packages
import glob, os, shutil, sys
dst = sys.argv[1]
pats = [
    "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/images/*.jpg",
    "/opt/venv/lib/python3.12/site-packages/pygame/docs/generated/_images/camera_*.jpg",
    "/opt/venv/lib/python3.12/site-packages/pygame/docs/generated/_images/intro_*.jpg",
]
n = 0
for pat in pats:
    for p in glob.glob(pat):
        shutil.copy(p, os.path.join(dst, os.path.basename(p)))
        n += 1
print(f"{n} photos -> {dst}")
assert n >= 6, "photo gathering failed"
EOF

python -m lwm_tpu.apps.train_vqgan \
  --image_dir "$WORK/imgs" --output "$WORK/vqgan128.pkl" \
  --resolution 128 --steps 4000 --batch 16 \
  --hidden_channels 64 --channel_mult 1,2,2,4 --num_res_blocks 2 \
  --z_channels 64 --num_embeddings 1024 \
  --eval_crops 64 2>&1 | tee "$WORK/train.log"
grep -E "PSNR|usage|psnr" "$WORK/train.log" | tail -5
