#!/usr/bin/env python
"""Post-finetune judge, ONE process (axon init costs 5-8 min/process):
eval_woft 720p protocol (3 seqs x 30 frames, step 3 px/frame, V24_7 base
frames) for v4 AND v5 checkpoints, full + window modes. The tracker graph
is identical across checkpoints, so all four runs share two compiles.

v5 joins the configs/flow/wraft_large.py ladder ONLY if it beats v4's
rows (r4 record: 1.306 full / 1.348 window px median).

Usage: python tools/r5_eval.py [ckpts...]  (default: v4 v5)
"""

import json
import os
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
CONFIGS = {"full": "WOFT.py", "window": "WOFT_window.py"}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_eval(config_file, seqs=3, frames=30, step_px=3.0, seed=0):
    from woft_tpu.config import load_config
    from woft_tpu.eval.synth_eval import evaluate_tracker_synthetic

    config = load_config(str(REPO / "woft_tpu" / "configs" / config_file))
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
    ckpts = sys.argv[1:] or ["wraft_tpu_v4", "wraft_tpu_v5"]
    rows = {}
    for ck in ckpts:
        os.environ["WOFT_WRAFT_CKPT"] = str(REPO / "weights" / ck)
        for mode, cfgf in CONFIGS.items():
            log(f"--- {ck} {mode} ---")
            try:
                summary = run_eval(cfgf)
            except Exception as e:  # noqa: BLE001 — record and continue
                import traceback
                traceback.print_exc()
                summary = {"error": str(e)[:200]}
            rows[f"{ck}_{mode}"] = summary
            print("RESULT " + json.dumps({f"{ck}_{mode}": summary}),
                  flush=True)
    Path("/tmp/recovery/r5_eval.json").write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
