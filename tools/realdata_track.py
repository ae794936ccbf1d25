#!/usr/bin/env python
"""Track the labeled real-footage sequences with BOTH tracker modes and
score against the hand-labeled GT (VERDICT r4 weak #5: 'labels exist,
evidence doesn't').

Runs on CPU by default (WOFT_CPU=0 to allow the TPU tunnel): deterministic
and safe to run while the chip is busy benching. Sequences/GT:

- V24_7 kiosk panel, bbox 430,215,310,490; GT = inset street-map corners
  at frames 60/90/120/150/200 (tools/v24_labels.json, 6 labeled frames).
- V25_2 bank-window poster, bbox 435,173,302,403; GT = poster frame
  corners at frames 25/50 (tools/v25_labels.json).

Usage: python tools/realdata_track.py [--out /tmp/realdata]
Writes one npz per (seq, mode) and prints a markdown table.
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
if os.environ.get("WOFT_CPU", "1") != "0":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import cv2
import numpy as np

from woft_tpu.config import load_config

REPO = Path(__file__).resolve().parent.parent
SEQS = {
    "V24_7": {"path": "/root/reference/demo/V24_7",
              "bbox": (430, 215, 310, 490), "frames": 200,
              "labels": "v24_labels.json"},
    "V25_2": {"path": "/root/reference/demo/V25_2",
              "bbox": (435, 173, 302, 403), "frames": 50,
              "labels": "v25_labels.json"},
}
MODES = {"full": "WOFT.py", "window": "WOFT_window.py"}


def track(seq, mode, downscale=2):
    info = SEQS[seq]
    paths = sorted(Path(info["path"]).glob("*.jpg"))[:info["frames"]]
    frames = [cv2.imread(str(p)) for p in paths]
    mask = np.zeros(frames[0].shape[:2], np.uint8)
    x, y, w, h = info["bbox"]
    mask[y:y + h, x:x + w] = 1

    conf = load_config(str(REPO / "woft_tpu" / "configs" / MODES[mode]))
    conf.downscale_inputs = downscale
    tr = conf.tracker_class(conf)
    tr.init(frames[0], mask)
    hs = []
    for f in frames[1:]:
        H, meta = tr.track(f)
        hs.append(np.asarray(H, np.float64))
    return np.stack(hs)


def score(hs, labels):
    p1 = np.asarray(labels["1"], np.float64)
    pts1 = np.concatenate([p1, np.ones((4, 1))], 1).T
    rows = []
    for fname, quad in labels.items():
        fi = int(fname)
        if fi == 1 or fi - 2 >= len(hs):
            continue
        H = hs[fi - 2]
        proj = np.linalg.inv(H) @ pts1
        proj = (proj[:2] / proj[2:]).T
        err = float(np.mean(np.linalg.norm(
            proj - np.asarray(quad, np.float64), axis=1)))
        rows.append((fi, err))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/realdata")
    ap.add_argument("--downscale", type=int, default=2)
    ap.add_argument("--seqs", default="V24_7,V25_2")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    results = {}
    for seq in args.seqs.split(","):
        labels = json.loads(
            (REPO / "tools" / SEQS[seq]["labels"]).read_text())["frames"]
        for mode in MODES:
            key = f"{seq}_{mode}"
            npz = out / f"{key}.npz"
            print(f"=== tracking {key} ...", flush=True)
            hs = track(seq, mode, args.downscale)
            np.savez(npz, H=hs)
            results[key] = score(hs, labels)
            print(key, results[key], flush=True)

    print("\n| seq | frame | full (px) | window (px) |")
    print("|---|---|---|---|")
    for seq in args.seqs.split(","):
        f_rows = dict(results[f"{seq}_full"])
        w_rows = dict(results[f"{seq}_window"])
        for fi in sorted(f_rows):
            print(f"| {seq} | {fi} | {f_rows[fi]:.2f} | "
                  f"{w_rows.get(fi, float('nan')):.2f} |")


if __name__ == "__main__":
    main()
