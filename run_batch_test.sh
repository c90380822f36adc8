#!/bin/bash
# Batch regression check: caption one image with every checkpoint in a
# directory, in epoch order — the reference's qualitative-progression
# harness (reference run_batch_test.sh:22-39), generalized: it globs
# checkpoints instead of hardcoding ten filenames.
#
# Usage: ./run_batch_test.sh <image> [checkpoint_dir]
set -u

IMAGE="${1:?usage: run_batch_test.sh <image> [checkpoint_dir]}"
CKPT_DIR="${2:-.}"

shopt -s nullglob
CKPTS=("$CKPT_DIR"/*.safetensors)
if [ ${#CKPTS[@]} -eq 0 ]; then
    echo "No .safetensors checkpoints found in $CKPT_DIR" >&2
    exit 1
fi

for ckpt in $(ls -1 "${CKPTS[@]}" | sort -t_ -k5 -n); do
    echo "=============================================="
    echo "Checkpoint: $ckpt"
    python inference.py --image_path "$IMAGE" --checkpoint_path "$ckpt" || exit 1
done
