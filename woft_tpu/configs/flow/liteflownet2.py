"""External-backend flow config (LiteFlowNet2 role, ablations 10-12).

Twin of ref:pytracking/optical_flow/configs/mmflow-liteflownet2.py: an
external flow network plus a separately-trained ``WeightHead`` over its 7x7
local correlation cost volume (ref:optical_flow/mm.py:133-190). The
reference's LiteFlowNet2 lives in an mmflow fork that is not shipped
(SURVEY.md section 2.9); the backend here defaults to a TPU-native 'orig'
RAFT exposing the same (flow, local cost volume) interface, and the weight
head loads the ONE real checkpoint the reference ships
(weights/liteflownet2_v2/wraft_weights-ep04-end.pth).
"""

from pathlib import Path

from woft_tpu.config import Config

_SHIPPED_HEAD = Path("/root/reference/pytracking/weights/liteflownet2_v2/"
                     "wraft_weights-ep04-end.pth")


def get_config():
    conf = Config()

    from woft_tpu.flow.external import ExternalFlowWrapper
    conf.of_class = ExternalFlowWrapper
    conf.backend_fn = None          # None -> default RAFT backend
    conf.backend_iters = 12
    conf.patch = 7

    weight_dir = Path(__file__).resolve().parent.parent.parent.parent / "weights"
    local = weight_dir / "liteflownet2_v2/wraft_weights-ep04-end.pth"
    conf.model = local if local.exists() else _SHIPPED_HEAD

    backend_candidates = [weight_dir / "wraft_tpu_v3",
                          weight_dir / "wraft_tpu_v2"]
    conf.backend_model = next(
        (c for c in backend_candidates if c.exists()), None)

    conf.iters = 12
    conf.padding_mode = "nopad"
    conf.precision = "highest"

    conf.name = Path(__file__).stem
    return conf
