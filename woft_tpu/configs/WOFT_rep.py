"""Ablation_07 config: weight head trained WITHOUT RAFT fine-tuning — the
flow config swaps to the 'rep' (non-RAFT-finetuned) checkpoint, everything
else canonical (twin of
ref:pytracking/configs/YAOFT_single_control_rep_sub500_noreliableinl_wLSq.py,
whose only diff from canonical is the flow config, SURVEY.md section 2.3)."""

from woft_tpu.configs._ablation_base import build_config


def get_config():
    return build_config(flow_config='wraft_large_rep.py')
