"""Ablation config: similarity (translation/rotation/scale) fit via
cv2.estimateAffinePartial2D instead of a full homography
(ref:pytracking/utils/least_squares_H.py:349-363)."""

from woft_tpu.configs._ablation_base import build_config


def get_config():
    return build_config(estimator='trs')
