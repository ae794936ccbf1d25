"""Ablation_11 config: external flow backend, no weight head, cv2 RANSAC
solver (twin of
ref:pytracking/configs/WOFT_liteflownet2_noweights_cvransac.py)."""

from woft_tpu.configs._ablation_base import build_config


def get_config():
    return build_config(flow_config='liteflownet2.py', estimator='cvransac',
                        flow_overrides={'use_weight_head': False})
