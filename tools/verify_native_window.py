#!/usr/bin/env python
"""Verify drive: native-scale window mode vs fixed-budget, real TPU, V24_7.

Tracks the kiosk inset 60 frames with configs/WOFT_window_native.py and
configs/WOFT_window.py in ONE process, reports the chosen window dims, the
crop scale, and frame-60 corner error vs the hand label
(tools/v24_labels.json, +-2-3 px precision).
"""

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
SEQ = Path("/root/reference/demo/V24_7")
BBOX = (430, 215, 310, 490)
N_FRAMES = 60


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def drive(config_file, frames, gt60):
    from woft_tpu.config import load_config
    from woft_tpu.geometry.homography import np_h_proj

    config = load_config(str(REPO / "woft_tpu" / "configs" / config_file))
    tracker = config.tracker_class(config)
    mask = np.zeros(frames[0].shape[:2], np.uint8)
    x, y, w, h = BBOX
    mask[y:y + h, x:x + w] = 1
    t0 = time.time()
    tracker.init(frames[0], mask)
    log(f"{config_file}: init done {time.time()-t0:.1f}s "
        f"win_hw={tracker.win_hw} "
        f"scale={np.asarray(tracker.h_tmpl_crop)[0,0]:.4f}/"
        f"{np.asarray(tracker.h_tmpl_crop)[1,1]:.4f}")
    errs = None
    t0 = time.time()
    for i, frame in enumerate(frames[1:], start=2):
        h_cur2init, meta = tracker.track(frame)
        if i == N_FRAMES:
            # project the labeled frame-1 corners into frame 60
            h_init2cur = np.linalg.inv(h_cur2init)
            proj = np_h_proj(h_init2cur, np.asarray(gt60["1"], float).T)
            errs = np.linalg.norm(proj - np.asarray(gt60["60"], float).T,
                                  axis=0)
    dt = time.time() - t0
    log(f"{config_file}: {len(frames)-1} frames in {dt:.1f}s "
        f"({(len(frames)-1)/dt:.2f} fps host loop)")
    return {"win_hw": list(tracker.win_hw),
            "corner_err_f60": [float(e) for e in errs],
            "mean_err_f60": float(np.mean(errs))}


def main():
    labels = json.loads((REPO / "tools" / "v24_labels.json").read_text())
    gt = labels["frames"]
    paths = sorted(SEQ.glob("*.jpg"))[:N_FRAMES]
    frames = [cv2.imread(str(p)) for p in paths]
    log(f"loaded {len(frames)} frames {frames[0].shape}; "
        f"devices={jax.devices()}")
    out = {}
    for cfg in ("WOFT_window_native.py", "WOFT_window.py"):
        out[cfg] = drive(cfg, frames, gt)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
