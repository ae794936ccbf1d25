from .io import GeneralVideoCapture, VideoWriter, read_flow_png, write_flow_png  # noqa: F401
from .timing import time_measurer, device_time_measurer  # noqa: F401
from .logging_utils import SparseExceptionLogger  # noqa: F401
from .random_utils import tmp_np_seed  # noqa: F401
from .notifications import send_notification, with_notification  # noqa: F401
from .flow_formats import read_flo, write_flo, read_pfm, write_pfm, read_gen  # noqa: F401
