"""POT real-data evaluation path: annotation parsing, corner scoring, and
the sequence driver with exact synthetic ground truth
(ref:README.org:2-17 — paper metrics on POT-210)."""

import numpy as np
import pytest

from woft_tpu.eval.pot import (corner_error_stats, corners_from_homographies,
                               evaluate_pot_sequence, mask_from_corners,
                               read_pot_annotations)


def test_read_pot_annotations(tmp_path):
    ann = tmp_path / "V1_gt_points.txt"
    ann.write_text(
        "# header comment\n"
        "10 20 110 20 110 90 10 90\n"
        "11.5,21.5,111.5,21.5,111.5,91.5,11.5,91.5\n"
        "\n"
        "nan nan nan nan nan nan nan nan\n"
        "short line\n")
    gt = read_pot_annotations(ann)
    assert gt.shape == (4, 4, 2)
    assert np.allclose(gt[0], [[10, 20], [110, 20], [110, 90], [10, 90]])
    assert np.allclose(gt[1, 0], [11.5, 21.5])
    assert np.isnan(gt[2]).all() and np.isnan(gt[3]).all()


def test_corner_error_stats_skips_unlabeled():
    gt = np.zeros((3, 4, 2))
    gt[1] = np.nan
    est = np.zeros((3, 4, 2))
    est[0] += 1.0      # sqrt(2) per corner
    est[2] += 3.0
    m = corner_error_stats(est, gt, thresholds=(2, 5))
    assert m["frames"] == 2
    assert m["median_px"] == pytest.approx(
        (np.sqrt(2) + 3 * np.sqrt(2)) / 2)
    assert m["p@5px"] == 1.0
    assert m["p@2px"] == 0.5


def test_corners_from_homographies_roundtrip():
    quad = np.array([[10.0, 10], [50, 10], [50, 40], [10, 40]])
    h = np.array([[1.0, 0, 5], [0, 1, -3], [0, 0, 1]])
    # H maps cur->init; corners in cur frame = inv(H) @ init corners
    c = corners_from_homographies([h], quad)[0]
    assert np.allclose(c, quad + [-5, 3])


class OracleTracker:
    """Knows the GT homography trajectory; API-compatible shell."""

    def __init__(self, hs):
        self.hs = list(hs)
        self.i = 0

    def init(self, frame, mask):
        assert mask.any()

    def track(self, frame, debug=False):
        h = self.hs[self.i]
        self.i += 1
        return h.copy(), None


def test_evaluate_pot_sequence_oracle(tmp_path):
    import cv2
    rng = np.random.default_rng(0)
    frames = []
    for i in range(4):
        p = tmp_path / f"{i:04d}.jpg"
        cv2.imwrite(str(p), rng.integers(0, 255, (60, 80, 3), np.uint8))
        frames.append(p)

    quad = np.array([[20.0, 15], [60, 15], [60, 45], [20, 45]])
    hs = [np.array([[1.0, 0, -float(i + 1)], [0, 1, 0], [0, 0, 1]])
          for i in range(3)]             # cur->init: shift right by i+1
    gt = np.concatenate(
        [quad[None]] + [(quad + [i + 1, 0])[None] for i in range(3)])

    m, est, hs_out = evaluate_pot_sequence(OracleTracker(hs), frames, gt)
    assert m["frames"] == 3
    assert m["median_px"] < 1e-9
    assert m["p@2px"] == 1.0
    assert est.shape == (3, 4, 2)

    mask = mask_from_corners((60, 80), quad)
    assert mask[30, 40] == 255 and mask[0, 0] == 0
