#!/bin/bash
# Round-4 on-chip validation ladder (tunnel healed 2026-08-18 ~12:40 UTC).
# Reordered from recovery_run.sh for an empty compile cache + ~5h budget:
# 1) prove the driver's own bench graph (window tracker) with kernels off,
# 2) A/B every r3 kernel on the real chip (VERDICT weak #1) and gate,
# 3) prove the kernels-ON window graph (what the driver will run),
# 4) full-frame 1080p off/on rows (VERDICT ask #2),
# 5) demo verify + 4K rows (VERDICT ask #4) as time allows.
set -u
cd /root/repo
OUT=/tmp/recovery
mkdir -p "$OUT"
: > "$OUT/status.txt"

run_step() { # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
  timeout "$tmo" "$@" > "$OUT/${name}.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
  return $rc
}

# 0. window canary, new loop kernels pinned OFF — the last-measured graph.
WOFT_BENCH_GRU=0 WOFT_BENCH_TAIL=0 run_step 00_canary_window 2400 \
  python bench.py

# A/Bs for every kernel committed-but-never-run-on-chip (r3).
run_step 02_gru_ab 2400 python tools/gru_ab.py
GRU_OK=$?
run_step 02a_update_ab 2400 python tools/update_ab.py
TAIL_OK=$?
run_step 02b_pallas_ab 3600 python tools/pallas_ab.py
LOCAL_OK=$?
run_step 02c_warp_bench 3600 python tools/warp_bench.py
run_step 02d_fused_lookup_ab 2400 python tools/fused_lookup_ab.py

# 0b. THE DRIVER'S GRAPH: plain bench.py (window, kernels auto). Only if the
# loop-kernel A/Bs passed; else defaults must be flipped off first (manual).
if [ "$GRU_OK" -eq 0 ] && [ "$TAIL_OK" -eq 0 ]; then
  run_step 00b_window_kern_auto 2400 python bench.py
else
  echo "=== 00b skipped (gru_ab rc=$GRU_OK update_ab rc=$TAIL_OK) -> FLIP DEFAULTS OFF" \
    | tee -a "$OUT/status.txt"
fi

# full-frame 1080p, fused loop kernels OFF vs ON (fresh jaxprs, 30-60 min ea).
WOFT_BENCH_TRACKER=full WOFT_BENCH_CORR=local WOFT_BENCH_GRU=0 \
  WOFT_BENCH_TAIL=0 run_step 03_full1080_kern0 5400 python bench.py
if [ "$GRU_OK" -eq 0 ] || [ "$TAIL_OK" -eq 0 ]; then
  WOFT_BENCH_TRACKER=full WOFT_BENCH_CORR=local \
    WOFT_BENCH_GRU=$([ "$GRU_OK" -eq 0 ] && echo 1 || echo 0) \
    WOFT_BENCH_TAIL=$([ "$TAIL_OK" -eq 0 ] && echo 1 || echo 0) \
    run_step 04_full1080_kern1 5400 python bench.py
else
  echo "=== 04 skipped (gru_ab rc=$GRU_OK update_ab rc=$TAIL_OK)" \
    | tee -a "$OUT/status.txt"
fi
unset WOFT_BENCH_TRACKER WOFT_BENCH_CORR WOFT_BENCH_GRU WOFT_BENCH_TAIL \
  2>/dev/null

# end-to-end demo drive on real footage (compiles the 720p demo graph).
run_step 01_verify_demo 2400 python WOFT_demo.py \
  /root/reference/demo/V24_7 --headless --out /tmp/recovery/demo_out \
  --bbox 430,215,310,490 --max-frames 40

# 4K rows (BASELINE config 5 + alternate_corr reason-for-being size).
run_step 06_stream_4k 5400 python tools/stream_bench.py --frames 100
WOFT_BENCH_TRACKER=full WOFT_BENCH_ALT=1 WOFT_BENCH_H=2160 WOFT_BENCH_W=3840 \
  WOFT_BENCH_FRAMES=10 run_step 07_alt4k 5400 python bench.py

echo "=== ALL DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
