"""Original (unweighted) RAFT flow config.

Twin of ref:pytracking/optical_flow/configs/orig_raft_sintel.py: 'orig'
variant, 24 GRU iterations, RAFT replicate padding.
"""

from pathlib import Path

from woft_tpu.config import Config


def get_config():
    conf = Config()

    from woft_tpu.flow.wrapper import RaftFlow
    conf.of_class = RaftFlow
    conf.raft_type = "orig"

    conf.class_params = Config()
    conf.class_params.small = False
    conf.class_params.mixed_precision = False
    conf.class_params.alternate_corr = False

    weight_dir = Path(__file__).resolve().parent.parent.parent.parent / "weights"
    conf.model = weight_dir / "raft-sintel.pth"
    conf.add_module_to_statedict = True
    conf.non_strict_loading = False

    conf.iters = 24
    conf.padding_mode = "RAFT"
    conf.precision = "highest"

    conf.name = Path(__file__).stem
    return conf
