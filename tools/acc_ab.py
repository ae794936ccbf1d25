#!/usr/bin/env python
"""Accuracy A/B on the 720p synth-eval protocol: eval-side quality levers.

One process (axon init is expensive), window mode, v5 ckpt. Variants:
RAFT iters 12 (canonical) vs 24, fit sample count Sobol-500 vs 2000.
The protocol matches tools/r5_eval.py exactly (3 seqs x 30 frames,
step 3 px/frame, V24_7 base frames, seed 0) so rows compare against the
recorded ladder (v5 window: 1.315 / 0.81 / 2.26).

Usage: python tools/acc_ab.py [full|window]
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import cv2
import numpy as np

REPO = Path(__file__).resolve().parent.parent
IMAGES = Path("/root/reference/demo/V24_7")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_eval(mode, iters, subsample_n, seqs=3, frames=30, step_px=3.0,
             seed=0):
    from woft_tpu.config import load_config
    from woft_tpu.eval.synth_eval import evaluate_tracker_synthetic

    cfg_file = {"full": "WOFT.py", "window": "WOFT_window.py"}[mode]
    config = load_config(str(REPO / "woft_tpu" / "configs" / cfg_file))
    config.flow_config.iters = iters
    config.tracker_params = dataclasses.replace(
        config.tracker_params, subsample_n=subsample_n)
    tracker = config.tracker_class(config)
    paths = sorted(IMAGES.glob("*.jpg"))
    rng = np.random.default_rng(seed)
    all_metrics = []
    for s in range(seqs):
        base = cv2.imread(str(paths[rng.integers(len(paths))]))
        H, W = base.shape[:2]
        base = base[:H - H % 8, :W - W % 8]
        H, W = base.shape[:2]
        mask = np.zeros((H, W), np.uint8)
        mask[H // 4:3 * H // 4, W // 4:3 * W // 4] = 255
        metrics, _, _ = evaluate_tracker_synthetic(
            tracker, base, mask, n_frames=frames, seed=seed + s,
            noise=0.0, max_step_px=step_px)
        all_metrics.append(metrics)
    return {k: float(np.mean([m[k] for m in all_metrics]))
            for k in all_metrics[0]}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "window"
    grid = [(12, 500), (24, 500), (12, 2000), (24, 2000)]
    out = {}
    for iters, n in grid:
        t0 = time.time()
        m = run_eval(mode, iters, n)
        key = f"{mode} iters={iters} n={n}"
        out[key] = m
        log(f"{key}: median={m['median_px']:.3f} p@2={m['p@2px']:.3f} "
            f"p90={m['p90_px']:.3f} ({time.time()-t0:.0f}s)")
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
