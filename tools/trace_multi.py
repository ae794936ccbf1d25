#!/usr/bin/env python
"""Capture an xprof trace of the BATCHED multi-target window step and print
the top device ops — the profile VERDICT r3 weak #5 asked for (x8 targets
runs at 12.9% MFU vs 27.6% single; something loses the 2.1x).

Usage: python tools/trace_multi.py [n_targets] [H W]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    H -= H % 8
    W -= W % 8
    from woft_tpu.models.raft import RaftConfig, init_raft_params
    from woft_tpu.tracker import TrackerParams
    from woft_tpu.tracker.window_step import (WindowParams,
                                              build_window_track_step,
                                              window_init_state)

    # identical construction to bench.py::bench_multi (the 12.9%-MFU row)
    kw = {}
    if os.environ.get("WOFT_BENCH_CORR"):
        kw["corr_impl"] = os.environ["WOFT_BENCH_CORR"]
    cfg = RaftConfig(variant="weighted", iters=12, precision="bf16", **kw)
    tp = TrackerParams(padding_mode="nopad", redetection="always",
                       no_local_h=True)
    wp = WindowParams(size=256)
    params = init_raft_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)
    states = []
    for t in range(n):
        mask = np.zeros((H, W), bool)
        y = (t // 4) * (H // 2)
        x = (t % 4) * (W // 4)
        mask[y + H // 8:y + 3 * H // 8, x + W // 16:x + 3 * W // 16] = True
        states.append(window_init_state(params, cfg, tp, wp, base,
                                        jnp.asarray(mask)))
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    inner = build_window_track_step(cfg, tp, wp)._raw_step
    step = jax.jit(lambda p, s, f: jax.vmap(
        lambda si: inner(p, si, f))(s))
    frame = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)

    batched, hs, meta = step(params, batched, frame)
    _ = np.asarray(hs)
    print("compiled; tracing...", flush=True)

    log_dir = "/tmp/woft_xprof_multi"
    os.system(f"rm -rf {log_dir}")
    with jax.profiler.trace(log_dir):
        for _ in range(3):
            batched, hs, meta = step(params, batched, frame)
        _ = np.asarray(hs)

    traces = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", traces, flush=True)
    if not traces:
        raw = glob.glob(f"{log_dir}/**/*", recursive=True)
        print("\n".join(raw[:50]))
        return 1
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
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
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:45]
    print(f"total traced op-time: {total / 1e3:.1f} ms (3 steps, {n} targets)")
    for name, dur in top:
        print(f"{dur / 1e3 / 3:9.2f} ms/step  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
