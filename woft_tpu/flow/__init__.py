from .wrapper import RaftFlow, FlowResult, sigmoid  # noqa: F401
from .cache import FlowCache, identify_image  # noqa: F401
from .external import (  # noqa: F401
    ExternalFlowWrapper,
    cost_volume_weight_head,
    local_cost_volume,
)
