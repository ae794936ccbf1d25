#!/bin/bash
# Follow-up to recovery_run.sh for round 4: waits for the ladder's ALL DONE
# marker, then runs the steps the ladder missed (gru_ab/update_ab failed on
# a missing sys.path insert before their fix; step 04 was consequently
# skipped) plus the new fused dense-pyramid lookup A/B.
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

# wait for the main ladder (poll; bounded at 8h)
for i in $(seq 1 960); do
  grep -q "ALL DONE" "$OUT/status.txt" 2>/dev/null && break
  sleep 30
done
grep -q "ALL DONE" "$OUT/status.txt" || {
  echo "=== followup: ladder never finished, proceeding anyway $(date -u +%H:%M:%S)" \
    | tee -a "$OUT/status.txt"; }

run_step 10_gru_ab 2400 python tools/gru_ab.py
GRU_OK=$?
run_step 11_update_ab 2400 python tools/update_ab.py
TAIL_OK=$?

if [ "$GRU_OK" -eq 0 ] || [ "$TAIL_OK" -eq 0 ]; then
  WOFT_BENCH_TRACKER=full WOFT_BENCH_CORR=local \
    WOFT_BENCH_GRU=$([ "$GRU_OK" -eq 0 ] && echo 1 || echo 0) \
    WOFT_BENCH_TAIL=$([ "$TAIL_OK" -eq 0 ] && echo 1 || echo 0) \
    run_step 12_full1080_kern1 5400 python bench.py
else
  echo "=== 12 skipped (gru_ab rc=$GRU_OK update_ab rc=$TAIL_OK)" \
    | tee -a "$OUT/status.txt"
fi
unset WOFT_BENCH_TRACKER WOFT_BENCH_CORR WOFT_BENCH_GRU WOFT_BENCH_TAIL \
  2>/dev/null

# fused dense-pyramid lookup kernel (corr_impl='pallas' fix): small compile
run_step 13_fused_lookup_ab 2400 python tools/fused_lookup_ab.py

echo "=== FOLLOWUP DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/status.txt"
