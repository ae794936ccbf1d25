"""Ablation config: deviation from canonical WOFT -> flow_config='orig_raft.py', estimator='plain_qr'.
(Twin of the reference's symlinked ablation family, SURVEY.md section 2.3.)"""

from woft_tpu.configs._ablation_base import build_config


def get_config():
    return build_config(flow_config='orig_raft.py', estimator='plain_qr')
