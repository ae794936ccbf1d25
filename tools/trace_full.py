#!/usr/bin/env python
"""Capture an xprof trace of the full-frame track step (cached graph) and
print the top device ops by total duration, parsed from the chrome trace.

Usage: WOFT_BENCH_CORR=local python tools/trace_full.py [H W]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    H -= H % 8
    W -= W % 8
    from woft_tpu.models.raft import RaftConfig, init_raft_params
    from woft_tpu.tracker import (TrackerParams, build_track_step,
                                  tracker_init_state)

    impl = os.environ.get("WOFT_BENCH_CORR", "local")
    cfg = RaftConfig(variant="weighted", iters=12, precision="bf16",
                     corr_impl=impl)
    tp = TrackerParams(padding_mode="nopad", redetection="always")
    params = init_raft_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    template = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)
    mask = np.zeros((H, W), bool)
    mask[H // 4:3 * H // 4, W // 4:3 * W // 4] = True
    state = tracker_init_state(params, cfg, tp, template, jnp.asarray(mask))
    step = build_track_step(cfg, tp)
    frame = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)

    state, h, meta = step(params, state, frame)
    _ = np.asarray(h)
    print("compiled; tracing...", flush=True)

    log_dir = "/tmp/woft_xprof"
    os.system(f"rm -rf {log_dir}")
    with jax.profiler.trace(log_dir):
        for _ in range(3):
            state, h, meta = step(params, state, frame)
        _ = np.asarray(h)

    traces = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", traces, flush=True)
    if not traces:
        raw = glob.glob(f"{log_dir}/**/*", recursive=True)
        print("\n".join(raw[:50]))
        return 1
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events: pid/tid with dur
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if name.startswith(("Steal", "Idle")):
                continue
            args = e.get("args") or {}
            key = args.get("long_name") or name
            by_name[key[:120]] += e["dur"]
            total += e["dur"]
    n_rows = int(os.environ.get("WOFT_TRACE_ROWS", "45"))
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:n_rows]
    print(f"total traced op-time: {total / 1e3:.1f} ms (3 steps)")
    for name, dur in top:
        print(f"{dur / 1e3 / 3:9.2f} ms/step  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
