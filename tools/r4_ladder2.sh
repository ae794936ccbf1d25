#!/bin/bash
# Round-4 ladder, part 2 — launched after the A/B block of r4_ladder.sh
# (part 1 is killed at the post-A/B window; step 04 kern1 is dropped:
# the earlier r4 session already measured GRU-on SLOWER, 12.0 vs 14.6 fps,
# and the loop kernels are opt-in now). Priorities: the driver's bench
# graph, the full-frame kern0 record row, traces (full + multi-target),
# demo verify, then 4K rows. The v5 fine-tune is started manually after.
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

# driver's graph: plain bench (window, kernels auto = off now; cache hit
# expected from the canary).
run_step 00b_window_auto 2400 python bench.py

# full-frame 1080p, loop kernels off (the canonical record row).
WOFT_BENCH_TRACKER=full WOFT_BENCH_CORR=local WOFT_BENCH_GRU=0 \
  WOFT_BENCH_TAIL=0 run_step 03_full1080_kern0 5400 python bench.py
unset WOFT_BENCH_TRACKER WOFT_BENCH_CORR WOFT_BENCH_GRU WOFT_BENCH_TAIL 2>/dev/null

# fresh trace of the current full-frame graph -> where the next ms are.
WOFT_BENCH_CORR=local run_step 05_trace_full 3600 python tools/trace_full.py
unset WOFT_BENCH_CORR 2>/dev/null

# multi-target x8 profile (VERDICT #5: 12.9% vs 27.6% MFU).
run_step 08_trace_multi 3600 python tools/trace_multi.py

# end-to-end demo drive on real footage.
run_step 01_verify_demo 2400 python WOFT_demo.py \
  /root/reference/demo/V24_7 --headless --out /tmp/recovery/demo_out \
  --bbox 430,215,310,490 --max-frames 40

# 4K rows (BASELINE config 5 + alternate_corr at its reason-for-being size).
run_step 06_stream_4k 5400 python tools/stream_bench.py --frames 100
WOFT_BENCH_TRACKER=full WOFT_BENCH_ALT=1 WOFT_BENCH_H=2160 WOFT_BENCH_W=3840 \
  WOFT_BENCH_FRAMES=10 run_step 07_alt4k 5400 python bench.py

echo "=== LADDER2 DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
