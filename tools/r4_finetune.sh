#!/bin/bash
# v5 fine-tune launcher (VERDICT r3 ask #3): multi-scale full-net fine-tune
# from v4 toward 720p <1.0 px median. Single chip + 1-core host — launch
# ONLY when no tunnel compiles are pending (the synth pipeline and XLA
# compiles fight over the one core). Judge checkpoints by eval_woft 720p
# rows, not val EPE (CLAUDE.md).
set -u
cd /root/repo
mkdir -p /tmp/recovery
exec > /tmp/recovery/20_finetune.log 2>&1
echo "=== v5 fine-tune start $(date -u +%H:%M:%S)"
# batch 16,8,6 OOMs the v5e at the 448x576 stage by 321 MB (16.06/15.75G,
# measured r5 09:13) — 16,6,4 fits
python train_wraft.py --images .train_imgs,.train_texs \
  --size 288x384,448x576,512x640 --batch 16,6,4 --iters 8 \
  --steps "${FT_STEPS:-4500}" --lr 5e-5 --train-flow --grad-clip 1.0 \
  --init weights/wraft_tpu_v4 --min-shift 0.01 --max-shift 0.25 \
  --scale-jitter 2.5 --ckpt-every 250 --val-every 100 \
  --out weights/wraft_tpu_v5
echo "=== v5 fine-tune rc=$? $(date -u +%H:%M:%S)"
