"""'weighted_masked' tracker config: WeightedRAFT plus the visibility
MaskHead; the sigmoided mask feeds TC validity alongside the template mask
(ref:pytracking/external/RAFT/raft_core/weighted_raft.py:296-310,
ref:optical_flow/raft.py:180-181,215-216). No reference config ships this
variant (the model supports it; SURVEY.md section 2.5) — structure defaults
mirror the weight head."""

from woft_tpu.configs._ablation_base import build_config


def get_config():
    return build_config(flow_overrides={'raft_type': 'weighted_masked'})
