"""Ablation_10 config: external flow backend WITHOUT the reliability weight
head — plain LSq over uniform weights
(twin of ref:pytracking/configs/WOFT_liteflownet2_noweights.py)."""

from woft_tpu.configs._ablation_base import build_config


def get_config():
    return build_config(flow_config='liteflownet2.py', estimator='plain_qr',
                        flow_overrides={'use_weight_head': False})
