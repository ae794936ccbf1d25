"""Canonical WeightedRAFT flow config.

Twin of ref:pytracking/optical_flow/configs/v2_SNOB_large_g05_RAFT.py:
weighted RAFT, large backbone, 12 GRU iterations, no padding. The reference
checkpoint (wraft_weights-ep01-end.pth) is not shipped upstream
(ref:.MISSING_LARGE_BLOBS); when absent we fall back to a seeded random
init, and any converted/orbax checkpoint path may be pointed to instead.
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
    # preference order: WOFT_WRAFT_CKPT override, natively trained orbax
    # checkpoints, then the reference .pth (absent upstream), then seeded
    # random init
    import os
    env_ckpt = os.environ.get("WOFT_WRAFT_CKPT")
    candidates = ([Path(env_ckpt)] if env_ckpt else []) + \
                 [weight_dir / "wraft_tpu_v4",
                  weight_dir / "wraft_tpu_v3",
                  weight_dir / "wraft_tpu_v2",
                  weight_dir / "wraft_tpu_v1",
                  weight_dir / "wraft_tpu_v0",
                  weight_dir / "v2_SNOB_large_g05_RAFT/wraft_weights-ep01-end.pth"]
    conf.model = next((c for c in candidates if c.exists()), candidates[-1])
    conf.add_module_to_statedict = True
    conf.non_strict_loading = False

    conf.iters = 12
    conf.padding_mode = "nopad"
    conf.precision = "highest"

    conf.name = Path(__file__).stem
    return conf
