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

Usage: python tools/r5_ladder.py [rungs...]   (default: all)
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

    if "01" in which:
        os.environ.pop("WOFT_BENCH_CHUNK", None)
        rung("01 full per-frame fastpath",
             lambda: bench.bench_full(jax, jnp, H, W, n, prec))
    if "02" in which:
        os.environ["WOFT_BENCH_CHUNK"] = "8"
        rung("02 full chunk=8",
             lambda: bench.bench_full(jax, jnp, H, W, n, prec))
        os.environ.pop("WOFT_BENCH_CHUNK", None)
    if "03" in which:
        os.environ["WOFT_BENCH_MULTI_MODE"] = "shared"
        os.environ["WOFT_BENCH_CHUNK"] = "4"
        rung("03 shared-flow multi x8",
             lambda: bench.bench_multi(jax, jnp, H, W, n, prec, window, 8))
        os.environ.pop("WOFT_BENCH_MULTI_MODE", None)
        os.environ.pop("WOFT_BENCH_CHUNK", None)
    if "04" in which:
        rung("04 deep trace full per-frame", lambda: (trace_rung(), None)
             and (0.0, None) or (0.0, None))


if __name__ == "__main__":
    main()
