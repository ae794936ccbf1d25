from .io import GeneralVideoCapture, VideoWriter, read_flow_png, write_flow_png  # noqa: F401
from .timing import time_measurer, device_time_measurer  # noqa: F401
from .logging_utils import SparseExceptionLogger  # noqa: F401
