"""Ablation_09 config: deviation from canonical WOFT -> cv2 RANSAC solver
(max_iters=10000, thr=3; twin of
ref:pytracking/configs/YAOFT_single_control_repRAFT_sub500_noreliableinl_cvransac.py:27)."""

from woft_tpu.configs._ablation_base import build_config


def get_config():
    return build_config(estimator='cvransac')
