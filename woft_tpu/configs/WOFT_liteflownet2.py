"""Ablation_12 config: external flow backend (LiteFlowNet2 role) + the
separately-trained cost-volume weight head, weighted-QR fit
(twin of ref:pytracking/configs/WOFT_liteflownet2.py)."""

from woft_tpu.configs._ablation_base import build_config


def get_config():
    return build_config(flow_config='liteflownet2.py')
