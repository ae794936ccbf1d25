from .raft import RaftConfig, WeightedRaft, init_raft_params  # noqa: F401
from .convert import torch_statedict_to_params, load_torch_checkpoint  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint, export_torch_pth  # noqa: F401
from .raft import weighted_raft_forward, encode_template  # noqa: F401
