from .raft import RaftConfig, WeightedRaft, init_raft_params  # noqa: F401
from .convert import torch_statedict_to_params, load_torch_checkpoint  # noqa: F401
