#!/bin/bash
# Round-4 ladder, part 2 (part 1 = tools/r4_ladder.sh, killed mid-00b when
# the session ended; its A/B steps all PASSed — see /tmp/recovery and
# RESULTS.md). Re-planned around the A/B timings: the motion-encoder
# kernel LOST on chip (1.95 vs 0.99 ms) so models/raft.py now keeps it
# on XLA and tail_pallas gates the flow-head kernel only (the winner,
# 4.79 vs 7.94 ms). GRU=1 is a recorded negative at full-frame; the
# candidate best config is GRU=0 TAIL=1.
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

# window row with the fh-only tail kernel (validates the me-split edit
# on chip; canary with kernels off = 139.6 fps, already green).
WOFT_BENCH_GRU=0 WOFT_BENCH_TAIL=1 run_step 00c_window_fh 2400 \
  python bench.py

# e2e demo drive on real footage (fresh 720p graph, trained ckpt).
run_step 01_verify_demo 2400 python WOFT_demo.py \
  /root/reference/demo/V24_7 --headless --out /tmp/recovery/demo_out \
  --bbox 430,215,310,490 --max-frames 40

# full-frame 1080p rows: kernels off, then fh-only (VERDICT ask #2).
WOFT_BENCH_TRACKER=full WOFT_BENCH_CORR=local WOFT_BENCH_GRU=0 \
  WOFT_BENCH_TAIL=0 run_step 03_full1080_kern0 5400 python bench.py
WOFT_BENCH_TRACKER=full WOFT_BENCH_CORR=local WOFT_BENCH_GRU=0 \
  WOFT_BENCH_TAIL=1 run_step 04_full1080_fh 5400 python bench.py

# multi-target x8 profile (VERDICT ask #5: 12.9% MFU vs 27.6% single).
run_step 08_trace_multi 3600 python tools/trace_multi.py

# 4K streaming row (BASELINE config 5) as time allows.
run_step 06_stream_4k 5400 python tools/stream_bench.py --frames 100

echo "=== LADDER2 DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
