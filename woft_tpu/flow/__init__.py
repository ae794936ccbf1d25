from .wrapper import RaftFlow, FlowResult, sigmoid  # noqa: F401
from .cache import FlowCache, identify_image  # noqa: F401
