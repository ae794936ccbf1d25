#!/usr/bin/env python
"""Evaluate a WOFT-TPU tracker config on synthetic ground-truth sequences.

The upstream release ships no evaluation harness (SURVEY.md section 2.9);
this regenerates the capability with exact ground truth: base frames (any
images, e.g. the demo clips) are warped along smooth random homography
trajectories; the tracker runs the full pipeline (pre-warp, flow, fit,
fallback ladder) and is scored with POT-style alignment metrics.

Example:
    python eval_woft.py --images /root/reference/demo/V24_7 \
        --config woft_tpu/configs/WOFT.py --frames 30 --seqs 5
"""

import argparse
import glob
import json
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def parse_args():
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--images", type=Path, required=True,
                   help="directory of base frames")
    p.add_argument("--config", type=Path,
                   default=Path(__file__).parent / "woft_tpu/configs/WOFT.py")
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--seqs", type=int, default=3)
    p.add_argument("--step-px", type=float, default=3.0)
    p.add_argument("--noise", type=float, default=0.0)
    p.add_argument("--downscale", type=int, default=0,
                   help="downscale base frames before evaluation")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=Path, help="write metrics JSON here")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(levelname)s:%(message)s")
    import cv2
    from woft_tpu.config import load_config
    from woft_tpu.eval.synth_eval import evaluate_tracker_synthetic

    paths = sorted(sum((glob.glob(str(args.images / f"*.{e}"))
                        for e in ("jpg", "jpeg", "png")), []))
    if not paths:
        raise SystemExit(f"no images under {args.images}")

    config = load_config(args.config)
    tracker = config.tracker_class(config)

    rng = np.random.default_rng(args.seed)
    all_metrics = []
    for s in range(args.seqs):
        base = cv2.imread(paths[rng.integers(len(paths))])
        if args.downscale:
            base = cv2.resize(base, None, fx=1 / args.downscale,
                              fy=1 / args.downscale)
        H, W = base.shape[:2]
        base = base[:H - H % 8, :W - W % 8]
        H, W = base.shape[:2]
        mask = np.zeros((H, W), np.uint8)
        mask[H // 4:3 * H // 4, W // 4:3 * W // 4] = 255

        metrics, h_pred, h_gt = evaluate_tracker_synthetic(
            tracker, base, mask, n_frames=args.frames, seed=args.seed + s,
            noise=args.noise, max_step_px=args.step_px)
        logger.info("seq %d: %s", s, metrics)
        all_metrics.append(metrics)

    summary = {k: float(np.mean([m[k] for m in all_metrics]))
               for k in all_metrics[0]}
    summary["seqs"] = args.seqs
    summary["frames"] = args.frames
    print(json.dumps(summary))
    if args.out:
        args.out.write_text(json.dumps(
            {"summary": summary, "per_seq": all_metrics}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
