#!/usr/bin/env python
"""Procedural training-texture generator for the WRAFT fine-tune corpus.

The env ships no image datasets beyond the two demo clips (~300 frames of
kiosk scenes), which is thin for fine-tuning at 720p content scale. The
synthetic-homography trainer's GT is exact for ANY content
(training/synth.py), so content diversity is free accuracy: this renders
N images mixing multi-octave value noise, geometric shapes, text glyphs,
gradients, and patch collages of the real frames — the classic synthetic
recipe for homography/flow nets (the reference trains on chairs/things
renders for the same reason, ref:raft_core/datasets.py:141-196).

Usage:
    python tools/gen_textures.py --out .train_texs --n 600 [--size 720x1280]
Then:
    python train_wraft.py --images .train_imgs,.train_texs ...
"""

import argparse
from pathlib import Path

import cv2
import numpy as np


def value_noise(rng, h, w, octaves=5, persistence=0.55):
    """Multi-octave smooth value noise in [0,1], (h,w)."""
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        gh, gw = max(2, h >> (octaves - o)), max(2, w >> (octaves - o))
        g = rng.random((gh, gw), dtype=np.float32)
        out += amp * cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC)
        total += amp
        amp *= persistence
    out /= total
    lo, hi = out.min(), out.max()
    return (out - lo) / max(hi - lo, 1e-6)


def colorize(rng, field):
    """Map a scalar field through a random smooth 3-stop color ramp."""
    stops = rng.integers(0, 256, (3, 3)).astype(np.float32)
    t = field[..., None]
    a = np.clip(2 * t, 0, 1)
    b = np.clip(2 * t - 1, 0, 1)
    c01 = stops[0] * (1 - a) + stops[1] * a
    return (c01 * (1 - b) + stops[2] * b).astype(np.float32)


def draw_shapes(rng, img):
    # cv2 5.x drawing prims (putText) require CV_8U canvases
    img = np.clip(img, 0, 255).astype(np.uint8).copy()
    h, w = img.shape[:2]
    for _ in range(rng.integers(4, 16)):
        color = tuple(int(v) for v in rng.integers(0, 256, 3))
        kind = rng.integers(0, 4)
        p1 = (int(rng.integers(w)), int(rng.integers(h)))
        # bound filled shapes to ~1/3 of the frame: a frame-dominating flat
        # fill is textureless (no flow signal) — wasted training content
        p2 = (int(np.clip(p1[0] + rng.integers(-w // 3, w // 3), 0, w - 1)),
              int(np.clip(p1[1] + rng.integers(-h // 3, h // 3), 0, h - 1)))
        thick = int(rng.integers(1, 12))
        if kind == 0:
            cv2.rectangle(img, p1, p2, color,
                          -1 if rng.random() < 0.5 else thick)
        elif kind == 1:
            cv2.circle(img, p1, int(rng.integers(5, h // 6)), color,
                       -1 if rng.random() < 0.5 else thick)
        elif kind == 2:
            cv2.line(img, p1, p2, color, thick)
        else:
            txt = "".join(chr(rng.integers(33, 127))
                          for _ in range(rng.integers(3, 12)))
            cv2.putText(img, txt, p1, int(rng.integers(0, 8)),
                        float(rng.uniform(0.5, 4.0)), color, thick)
    return img.astype(np.float32)


def collage(rng, real, h, w):
    """Random grid collage of crops from the real-frame pool."""
    img = np.zeros((h, w, 3), np.float32)
    gy, gx = int(rng.integers(2, 5)), int(rng.integers(2, 5))
    ch, cw = h // gy, w // gx
    for y in range(gy):
        for x in range(gx):
            src = real[rng.integers(len(real))]
            sh, sw = src.shape[:2]
            ph, pw = min(ch * 2, sh), min(cw * 2, sw)
            yy = rng.integers(sh - ph + 1)
            xx = rng.integers(sw - pw + 1)
            patch = cv2.resize(src[yy:yy + ph, xx:xx + pw], (cw, ch))
            img[y * ch:(y + 1) * ch, x * cw:(x + 1) * cw] = patch
    return img


def make_image(rng, real, h, w):
    mode = rng.integers(0, 4)
    if mode == 0:                                   # pure noise ramp
        img = colorize(rng, value_noise(rng, h, w))
    elif mode == 1:                                 # noise + shapes
        img = draw_shapes(rng, colorize(rng, value_noise(rng, h, w)))
    elif mode == 2 and real:                        # real-frame collage
        img = collage(rng, real, h, w)
        if rng.random() < 0.5:
            img = draw_shapes(rng, img)
    else:                                           # layered noise blend
        a = colorize(rng, value_noise(rng, h, w, octaves=3))
        b = colorize(rng, value_noise(rng, h, w, octaves=6))
        m = value_noise(rng, h, w, octaves=4)[..., None]
        img = draw_shapes(rng, a * m + b * (1 - m))
    # photometric jitter so the corpus spans exposure/contrast
    img = img * rng.uniform(0.6, 1.3) + rng.uniform(-25, 25)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=Path, default=Path(".train_texs"))
    p.add_argument("--n", type=int, default=600)
    p.add_argument("--size", default="720x1280")
    p.add_argument("--real", type=Path, default=Path(".train_imgs"),
                   help="real-frame pool for collages ('' to disable)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    h, w = (int(v) for v in args.size.split("x"))
    rng = np.random.default_rng(args.seed)
    real = []
    if str(args.real) and args.real.is_dir():
        paths = sorted(args.real.glob("*.jpg"))[:50]
        real = [cv2.imread(str(q)) for q in paths]
        real = [r for r in real if r is not None]
    args.out.mkdir(parents=True, exist_ok=True)
    for i in range(args.n):
        cv2.imwrite(str(args.out / f"tex{i:05d}.jpg"),
                    make_image(rng, real, h, w),
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        if i % 100 == 0:
            print(f"{i}/{args.n}", flush=True)
    print(f"wrote {args.n} images to {args.out}")


if __name__ == "__main__":
    main()
