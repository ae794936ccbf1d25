#!/bin/bash
# Round-4 ladder, part 4: the device-resident chunked multi-target step
# (pipeline.build_multi_track_chunk — one host dispatch per 8 frames; the
# r4 xprof attributed the x8-MFU deficit to per-frame dispatch+sync).
# A/B against the per-frame path in the same session, plus the full-frame
# xprof breakdown for the 30 fps push.
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

# health canary: the driver's headline graph (cached compile)
run_step 15_window_canary 2400 python bench.py

# x8 multi-target, device-resident chunk of 8 (fresh compile)
WOFT_BENCH_TRACKER=multi WOFT_BENCH_CHUNK=8 \
  run_step 16_multi_chunk8 5400 python bench.py

# x8 multi-target, per-frame dispatch (the 124 targets-fr/s baseline;
# cached compile) — same-session A/B denominator
WOFT_BENCH_TRACKER=multi run_step 17_multi_perframe 3600 python bench.py

# full-frame 1080p xprof breakdown (the 30 fps push needs attribution)
run_step 18_trace_full 5400 python tools/trace_full.py

echo "=== LADDER4 DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
