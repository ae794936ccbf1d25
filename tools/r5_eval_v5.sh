#!/bin/bash
# Post-finetune judge: eval_woft 720p rows for the v5 checkpoint, full +
# window modes, same protocol as the RESULTS accuracy table (3 seqs x 30
# frames, step 3 px/frame, 720p demo frames as the warp corpus).
# v5 is added to the configs/flow/wraft_large.py ladder ONLY if it wins
# BOTH rows vs v4's 1.306 (full) / 1.348 (window) px medians.
set -u
cd /root/repo
CKPT="${1:-weights/wraft_tpu_v5}"
TAG="$(basename "$CKPT")"
mkdir -p /tmp/recovery
for mode in full window; do
  cfg=woft_tpu/configs/WOFT.py
  [ "$mode" = window ] && cfg=woft_tpu/configs/WOFT_window.py
  echo "=== eval $TAG $mode $(date -u +%H:%M:%S)"
  WOFT_WRAFT_CKPT="$CKPT" timeout 3000 python eval_woft.py \
    --images /root/reference/demo/V24_7 --config "$cfg" \
    --frames 30 --seqs 3 --step-px 3 \
    --out "/tmp/recovery/eval_${TAG}_${mode}.json"
  echo "=== rc=$?"
done
echo "=== done $(date -u +%H:%M:%S)"
