"""ablation_07 flow config: weight head trained WITHOUT RAFT fine-tuning.

Twin of ref:pytracking/optical_flow/configs/v2_SNOB_large_g05.py — identical
to the canonical config except the checkpoint: the 'rep' weights train only
the weight head over a frozen upstream RAFT (epoch-09 snapshot), vs the
'_RAFT' variant whose whole network is fine-tuned (the only config diff is
the model path, diff-verified in SURVEY.md section 2.3).
"""

from pathlib import Path

from woft_tpu.config import Config


def get_config():
    conf = Config()

    from woft_tpu.flow.wrapper import RaftFlow
    conf.of_class = RaftFlow
    conf.raft_type = "weighted"

    conf.class_params = Config()
    conf.class_params.small = False
    conf.class_params.mixed_precision = False
    conf.class_params.alternate_corr = False
    conf.class_params.weight_head_structure = [(128, 3), (128, 3), (128, 3)]

    weight_dir = Path(__file__).resolve().parent.parent.parent.parent / "weights"
    # preference order: a natively trained head-only checkpoint, the
    # reference .pth (absent upstream, ref:.MISSING_LARGE_BLOBS), then the
    # canonical native checkpoint so the config stays runnable
    candidates = [weight_dir / "wraft_tpu_rep",
                  weight_dir / "v2_SNOB_large_g05/wraft_weights-ep09-end.pth",
                  weight_dir / "wraft_tpu_v3",
                  weight_dir / "wraft_tpu_v2"]
    conf.model = next((c for c in candidates if c.exists()), candidates[-1])
    conf.add_module_to_statedict = True
    conf.non_strict_loading = False

    conf.iters = 12
    conf.padding_mode = "nopad"
    conf.precision = "highest"

    conf.name = Path(__file__).stem
    return conf
