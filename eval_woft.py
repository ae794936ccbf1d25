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
import os
from pathlib import Path

import jax

if os.environ.get("WOFT_CPU"):      # deterministic tunnel-free run
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

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
    p.add_argument("--stress", action="store_true",
                   help="hard trajectories: 8px/frame steps, strong "
                        "rotation/perspective, sensor noise, and a large "
                        "motion jolt every 10 frames — exercises the "
                        "inlier-check redetection ladder end-to-end")
    p.add_argument("--downscale", type=int, default=0,
                   help="downscale base frames before evaluation")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=Path, help="write metrics JSON here")
    p.add_argument("--pot", type=Path,
                   help="POT ground-truth file (8 numbers/frame: 4 corner "
                        "x y pairs) or a directory containing frames + one "
                        "*.txt annotation — scores real footage instead of "
                        "synthetic trajectories")
    p.add_argument("--pot-ref", type=Path,
                   help="homographies.npz (+init corners from --pot or the "
                        "center quad) from a reference run — scores this "
                        "config against that run's corners on the same "
                        "frames (cross-mode regression on real footage)")
    return p.parse_args()


def run_pot(args, config):
    """Real-data POT evaluation path (--pot / --pot-ref)."""
    import glob as _glob
    import json
    import cv2
    from woft_tpu.eval.pot import (read_pot_annotations,
                                   corners_from_homographies,
                                   evaluate_pot_sequence)

    frames = sorted(sum((_glob.glob(str(args.images / f"*.{e}"))
                         for e in ("jpg", "jpeg", "png")), []))
    if not frames:
        raise SystemExit(f"no frames under {args.images}")

    if args.pot_ref:
        ref = np.load(args.pot_ref)
        hs = ref["H"]
        first = cv2.imread(frames[0])
        H, W = first.shape[:2]
        if "corners" in ref:
            quad = ref["corners"]
        else:   # the demo's default centered half-frame box
            quad = np.array([[W // 4, H // 4], [3 * W // 4, H // 4],
                             [3 * W // 4, 3 * H // 4], [W // 4, 3 * H // 4]],
                            np.float64)
        gt = np.concatenate([quad[None],
                             corners_from_homographies(hs, quad)])
    else:
        pot_path = args.pot
        if pot_path.is_dir():
            anns = sorted(pot_path.glob("*.txt"))
            if not anns:
                raise SystemExit(f"no *.txt annotation under {pot_path}")
            pot_path = anns[0]
        gt = read_pot_annotations(pot_path)
        quad = gt[0]

    tracker = config.tracker_class(config)
    metrics, est, hs = evaluate_pot_sequence(
        tracker, frames, gt, init_corners=quad,
        max_frames=args.frames if args.frames else 0)
    print(json.dumps(metrics))
    if args.out:
        args.out.write_text(json.dumps(metrics, indent=2))
    return 0


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(levelname)s:%(message)s")
    import cv2
    from woft_tpu.config import load_config
    from woft_tpu.eval.synth_eval import evaluate_tracker_synthetic

    config = load_config(args.config)
    if args.pot or args.pot_ref:
        return run_pot(args, config)

    paths = sorted(sum((glob.glob(str(args.images / f"*.{e}"))
                        for e in ("jpg", "jpeg", "png")), []))
    if not paths:
        raise SystemExit(f"no images under {args.images}")

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

        traj_kwargs = dict(max_step_px=args.step_px)
        noise = args.noise
        if args.stress:
            traj_kwargs = dict(max_step_px=max(args.step_px, 8.0),
                               max_rot=0.02, max_scale=0.01, max_persp=1e-5,
                               jump_every=10, jump_px=30.0)
            noise = max(noise, 3.0)
        metrics, h_pred, h_gt = evaluate_tracker_synthetic(
            tracker, base, mask, n_frames=args.frames, seed=args.seed + s,
            noise=noise, **traj_kwargs)
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
