#!/bin/bash
# Unattended tunnel-recovery ladder (CLAUDE.md round-3 runbook steps 1-6).
# Runs each on-chip validation/bench step serially with bounded timeouts,
# logging to /tmp/recovery/NN_name.log and recording exit codes in
# /tmp/recovery/status.txt. Designed to be launched by the tunnel watcher
# trigger the moment a health probe passes, so one healthy window executes
# the whole queue even if nobody is at the keyboard.
#
# Does NOT start the v5 fine-tune (step 7) — that is an hours-long run to
# be started manually after reviewing bench results.
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

# 0. window canary with the NEW loop kernels pinned OFF — matches the last
#    measured graph, confirms tunnel health, and is the comparability
#    reference for every later throughput row.
WOFT_BENCH_GRU=0 WOFT_BENCH_TAIL=0 run_step 00_canary_window 1800 \
  python bench.py
unset WOFT_BENCH_GRU WOFT_BENCH_TAIL 2>/dev/null

# 2. fused GRU on-chip A/B (small compile). Kernel A/Bs run BEFORE any
#    step that would exercise the new kernels via auto-gating.
run_step 02_gru_ab 2400 python tools/gru_ab.py
GRU_OK=$?

# 2a. fused motion-encoder + flow-head kernels on chip (small compile).
run_step 02a_update_ab 2400 python tools/update_ab.py
TAIL_OK=$?

# 2b. block-local construction + fine-multi lookup kernels on chip (the
#     fine=True default now routes through block_local_lookup_fine_multi).
run_step 02b_pallas_ab 3600 python tools/pallas_ab.py

# 2c. block-warp kernel on chip: small/mid tier dispatch, bf16 staging,
#     out-of-envelope fallback.
run_step 02c_warp_bench 3600 python tools/warp_bench.py

# 1. /verify end-to-end drive: demo CLI on real footage, real chip (after
#    the A/Bs — the demo config's precision decides whether the bf16 loop
#    kernels auto-gate in).
run_step 01_verify_demo 2400 python WOFT_demo.py \
  /root/reference/demo/V24_7 --headless --out /tmp/recovery/demo_out \
  --bbox 430,215,310,490 --max-frames 40

# 3. full-frame 1080p, fused loop kernels OFF — isolates the multi-level
#    lookup + tiered-warp gain vs the 17.5 fps baseline. Fresh jaxpr:
#    30-60+ min.
WOFT_BENCH_TRACKER=full WOFT_BENCH_CORR=local WOFT_BENCH_GRU=0 \
  WOFT_BENCH_TAIL=0 run_step 03_full1080_kern0 5400 python bench.py

# 4. same with every validated fused loop kernel ON.
if [ "$GRU_OK" -eq 0 ] || [ "$TAIL_OK" -eq 0 ]; then
  WOFT_BENCH_TRACKER=full WOFT_BENCH_CORR=local \
    WOFT_BENCH_GRU=$([ "$GRU_OK" -eq 0 ] && echo 1 || echo 0) \
    WOFT_BENCH_TAIL=$([ "$TAIL_OK" -eq 0 ] && echo 1 || echo 0) \
    run_step 04_full1080_kern1 5400 python bench.py
else
  echo "=== 04 skipped (gru_ab rc=$GRU_OK update_ab rc=$TAIL_OK)" \
    | tee -a "$OUT/status.txt"
fi

# bash keeps prefix-assignments alive after a function call — scrub them so
# later steps see only what they set themselves.
unset WOFT_BENCH_TRACKER WOFT_BENCH_CORR WOFT_BENCH_GRU WOFT_BENCH_TAIL \
  2>/dev/null

# 5. fresh trace of the (now current) full-frame graph -> next targets.
WOFT_BENCH_CORR=local run_step 05_trace_full 5400 python tools/trace_full.py
unset WOFT_BENCH_CORR 2>/dev/null

# 6a. 4K streaming (BASELINE config 5) — threaded decode + window step.
run_step 06_stream_4k 5400 python tools/stream_bench.py --frames 100

# 6b. alternate_corr at its reason-for-being size (4K full-frame).
WOFT_BENCH_TRACKER=full WOFT_BENCH_ALT=1 WOFT_BENCH_H=2160 WOFT_BENCH_W=3840 \
  WOFT_BENCH_FRAMES=10 run_step 07_alt4k 5400 python bench.py

echo "=== ALL DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
