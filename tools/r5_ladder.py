#!/usr/bin/env python
"""Round-5 on-chip ladder: full-frame fast-path corr + chunked dispatch +
shared-flow multi-target, in ONE process (axon backend init costs 5-8 min
per process; batch everything).

Rungs:
  01 full-frame 1080p per-frame dispatch (r5 corr fast path: nested
     zero-violator cond + sliced exact-sub weights) — vs r4's 14.85 fps
  02 full-frame 1080p chunk=8 device-resident scan
  03 shared-flow multi-target x8 (ONE flow, 8 vmapped fits), chunk=4
  04 deep trace of rung-01's graph (WOFT_TRACE_ROWS=120 equivalent)
  05 window-256 corr_impl='local' (the 178.8 fps r4 baseline, cached)
  06 window-256 corr_impl='pallas' (VERDICT #8: one in-graph row or
     formal retirement; fresh compile)
  07 stream 4K rows (VERDICT #3): native u8 / native f32 / cv2 u8

NOTE (r5): the first run of rungs 01-03 at 05:20 measured 6.4 fps against
a device time of 58.9 ms/step (the rung-04 trace in the SAME process) — a
TPU job had been killed at 05:15 and the tunnel was in its slow-drain
state (CLAUDE.md). Rerun on a quiet tunnel before trusting any row.

Usage: python tools/r5_ladder.py [rungs...]   (default: 01-04)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import bench


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def rung(name, fn):
    log(f"--- {name} ---")
    t0 = time.time()
    try:
        fps, flops = fn()
        row = {"rung": name, "fps": round(fps, 3),
               "wall_s": round(time.time() - t0, 1)}
        if flops:
            row["tflop_per_frame"] = round(flops / 1e12, 3)
            row["mfu_pct"] = round(100.0 * flops * fps / bench.PEAK_FLOPS, 2)
        print("RESULT " + json.dumps(row), flush=True)
    except Exception as e:
        import traceback
        traceback.print_exc()
        print("RESULT " + json.dumps({"rung": name, "error": str(e)[:300]}),
              flush=True)


def trace_rung():
    """Deep trace of the per-frame full step (cached graph by now)."""
    os.environ["WOFT_TRACE_ROWS"] = "130"
    import importlib
    sys.argv = ["trace_full.py"]
    tf = importlib.import_module("tools.trace_full")
    tf.main()


def main():
    which = set(sys.argv[1:]) or {"01", "02", "03", "04"}
    H, W, n, prec, window = 1080, 1920, 30, "bf16", 256

    # full-frame rungs MUST run corr_impl='local' (the WOFT_fast production
    # impl, ref r4 ladder): the 07:31 Aug-19 run left WOFT_BENCH_CORR unset
    # and measured the one-hot FULL-VOLUME path (6.4 fps at 2x the flops) —
    # those rows are config-mislabeled, not a regression vs r4's 14.85.
    if "01" in which:
        os.environ.pop("WOFT_BENCH_CHUNK", None)
        os.environ["WOFT_BENCH_CORR"] = "local"
        rung("01 full per-frame fastpath",
             lambda: bench.bench_full(jax, jnp, H, W, n, prec))
    if "02" in which:
        os.environ["WOFT_BENCH_CHUNK"] = "8"
        os.environ["WOFT_BENCH_CORR"] = "local"
        rung("02 full chunk=8",
             lambda: bench.bench_full(jax, jnp, H, W, n, prec))
        os.environ.pop("WOFT_BENCH_CHUNK", None)
    if "03" in which:
        os.environ["WOFT_BENCH_MULTI_MODE"] = "shared"
        os.environ["WOFT_BENCH_CHUNK"] = "4"
        os.environ["WOFT_BENCH_CORR"] = "local"
        # the shared-flow design amortizes ONE full-frame flow across N
        # targets: targets·fr/s = N * fps should grow ~linearly in N until
        # the vmapped fits bite (the >200 targets·fr/s VERDICT #4 bar).
        # Curve measured r5: 108/120/181/264/394/437 at 8..256 — x128 is
        # the knee (fits lax.map-group beyond multi_fit_chunk=64; a single
        # x128 fit vmap OOMs). Override rungs: WOFT_LADDER_MULTI_N=8,64,128
        nts = tuple(int(s) for s in os.environ.get(
            "WOFT_LADDER_MULTI_N", "8,16,32,64,128").split(","))
        for nt in nts:
            rung(f"03 shared-flow multi x{nt}",
                 lambda nt=nt: bench.bench_multi(jax, jnp, H, W, n, prec,
                                                 window, nt))
        os.environ.pop("WOFT_BENCH_MULTI_MODE", None)
        os.environ.pop("WOFT_BENCH_CHUNK", None)
    if "03w" in which:
        # window-mode multi (r4 row: 156 targets·fr/s with the then-default
        # one-hot) re-measured with corr_impl='local' (+18% at single-window)
        os.environ["WOFT_BENCH_CHUNK"] = "8"
        os.environ["WOFT_BENCH_CORR"] = "local"
        rung("03w window multi x8 local chunk=8",
             lambda: bench.bench_multi(jax, jnp, H, W, n, prec, window, 8))
        os.environ.pop("WOFT_BENCH_CHUNK", None)
    if "04" in which:
        rung("04 deep trace full per-frame", lambda: (trace_rung(), None)
             and (0.0, None) or (0.0, None))
    if "05" in which:
        os.environ["WOFT_BENCH_CORR"] = "local"
        rung("05 window-256 corr=local",
             lambda: bench.bench_window(jax, jnp, H, W, 60, prec, window))
    if "06" in which:
        os.environ["WOFT_BENCH_CORR"] = "pallas"
        rung("06 window-256 corr=pallas",
             lambda: bench.bench_window(jax, jnp, H, W, 60, prec, window))
        os.environ.pop("WOFT_BENCH_CORR", None)
    if "07" in which:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import stream_bench as sb
        n = sb.build_4k_frames(100)
        log(f"4K frames ready: {n}")
        d = sb.decode_only_rate(n)
        print(f"RESULT " + json.dumps(
            {"rung": "07a 4K native decode-only",
             "fps": round(d, 1) if d else None}), flush=True)
        # per-variant frame budgets: the f32 row moves 95 MB/frame through
        # the ~12.5 MB/s tunnel (~8 s/frame measured r5) — cap its wall time
        for name, native, u8, nf in (("07b stream4k native u8", True, 1, 60),
                                     ("07c stream4k native f32", True, 0, 12),
                                     ("07d stream4k cv2 u8", False, 1, 30)):
            os.environ["WOFT_STREAM_U8"] = str(u8)
            rung(name, lambda nat=native, nf=min(nf, n):
                 (sb.run_stream(nf, native=nat), None))


if __name__ == "__main__":
    main()
