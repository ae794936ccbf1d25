#!/bin/bash
# Round-4 ladder, part 3: re-measure after the separable axis-aligned
# window resample (ops/warp.py warp_axis_aligned) and the per-block
# capacity correction in the fine-slab lookup guard (models/corr.py) —
# both change the jitted graphs, so every step is a fresh compile.
set -u
cd /root/repo
OUT=/tmp/recovery
mkdir -p "$OUT"

run_step() { # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
  timeout "$tmo" "$@" > "$OUT/${name}.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
  return $rc
}

# the driver's headline graph: window-256 @1080p, kernels off
run_step 11_window_new 2400 python bench.py

# full-frame 1080p with the capacity lookup (north-star row), trained
# ckpt + real-motion video frames
WOFT_BENCH_TRACKER=full WOFT_BENCH_CORR=local \
  WOFT_BENCH_CKPT=weights/wraft_tpu_v4 \
  run_step 12_full_capacity 5400 python bench.py

# x8 multi-target with the matmul window extraction
WOFT_BENCH_TRACKER=multi run_step 13_multi_new 3600 python bench.py

# 4K streaming row (BASELINE config 5), post-OOM-fix
run_step 14_stream_4k 5400 python tools/stream_bench.py --frames 100

echo "=== LADDER3 DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
