#!/usr/bin/env python
"""WOFT-TPU benchmark: tracked frames/sec/chip on the flagship pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.json north star): >=30 tracked 1080p frames/s/chip on
v5e. The bench runs the full jitted tracker step (pre-warp, WeightedRAFT-12,
TC selection, weighted QR fit, inlier check) on synthetic 1080p-equivalent
frames on the real chip, steady-state (post-compile), happy path (no
fallback RAFT pass — the reference benchmarks the same non-lost hot path).

Env knobs:
  WOFT_BENCH_H / WOFT_BENCH_W   frame size (default 1080x1920)
  WOFT_BENCH_FRAMES             timed frames (default 20)
  WOFT_BENCH_PRECISION          'default' (bf16 MXU passes) | 'highest'
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from woft_tpu.models.raft import RaftConfig, init_raft_params
    from woft_tpu.tracker import (TrackerParams, build_track_step,
                                  tracker_init_state)

    H = int(os.environ.get("WOFT_BENCH_H", 1080))
    W = int(os.environ.get("WOFT_BENCH_W", 1920))
    n_frames = int(os.environ.get("WOFT_BENCH_FRAMES", 20))
    precision = os.environ.get("WOFT_BENCH_PRECISION", "default")
    H -= H % 8
    W -= W % 8

    cfg = RaftConfig(variant="weighted", iters=12, precision=precision)
    tp = TrackerParams(padding_mode="nopad")
    params = init_raft_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    template = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)
    mask = np.zeros((H, W), bool)
    mask[H // 4:3 * H // 4, W // 4:3 * W // 4] = True

    state = tracker_init_state(params, cfg, tp, template, jnp.asarray(mask))
    step = build_track_step(cfg, tp)

    frames = [jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)
              for _ in range(4)]

    # warmup / compile (np.asarray forces a real device round-trip:
    # block_until_ready is unreliable through tunneled backends)
    state, h, meta = step(params, state, frames[0])
    _ = np.asarray(h)

    t0 = time.perf_counter()
    for i in range(n_frames):
        state, h, meta = step(params, state, frames[i % len(frames)])
    _ = np.asarray(h)   # steps chain through state: this forces all of them
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    result = {
        "metric": f"tracked {H}x{W} frames/sec/chip (WeightedRAFT-12 + "
                  f"wLSq fit, {precision})",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
