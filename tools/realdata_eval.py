#!/usr/bin/env python
"""Score tracker homographies on REAL footage against hand-labeled GT
(VERDICT r2 weak #6: 'zero real-footage accuracy evidence').

GT: tools/v24_labels.json — the V24_7 kiosk panel's inset street-map
corners, hand-labeled on frames 1/60/120 from 3-5x zoomed crops
(+-2-3 px label precision). A tracker run (WOFT_demo.py --headless
--out D writes D/homographies.npz with H_cur2init per frame) is scored:

    err_k = mean_corners | H_k^-1(p_1) - p_k |

Usage:
    python tools/realdata_eval.py /tmp/v24_full/homographies.npz \
        [more npz ...] [--labels tools/v25_labels.json]

r4: --labels selects the GT file (default v24_labels.json; v25_labels.json
holds the V25_2 poster-frame corners, init bbox 435,173,302,403).
"""

import json
import sys
from pathlib import Path

import numpy as np

LABELS = Path(__file__).resolve().parent / "v24_labels.json"


def score(npz_path, labels):
    hs = np.load(npz_path)["H"]          # (T, 3, 3), frame index = row
    p1 = np.asarray(labels["1"], np.float64)
    pts1 = np.concatenate([p1, np.ones((4, 1))], 1).T
    rows = []
    for fname, quad in labels.items():
        fi = int(fname)
        if fi == 1:
            continue
        # demo files are 1-based (00000001.jpg is the INIT frame, which
        # gets no tracked H): file k -> hs[k-2]
        if fi - 2 >= len(hs):
            rows.append((fi, None))
            continue
        H = hs[fi - 2]
        proj = np.linalg.inv(H) @ pts1
        proj = (proj[:2] / proj[2:]).T
        err = float(np.mean(np.linalg.norm(
            proj - np.asarray(quad, np.float64), axis=1)))
        rows.append((fi, err))
    return rows


def main():
    args = sys.argv[1:]
    labels_path = LABELS
    if "--labels" in args:
        i = args.index("--labels")
        labels_path = Path(args[i + 1])
        args = args[:i] + args[i + 2:]
    labels = json.loads(labels_path.read_text())["frames"]
    for npz in args:
        print(f"== {npz}")
        for fi, err in score(npz, labels):
            print(f"  frame {fi:4d}: "
                  + (f"{err:7.2f} px (label precision +-2-3 px)"
                     if err is not None else "beyond run length"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
