"""Ablation config: deviation from canonical WOFT -> downscale=3.
(Twin of the reference's symlinked ablation family, SURVEY.md section 2.3.)"""

from woft_tpu.configs._ablation_base import build_config


def get_config():
    return build_config(downscale=3)
