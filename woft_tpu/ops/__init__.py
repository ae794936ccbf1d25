from .warp import (  # noqa: F401
    grid_sample,
    bilinear_sample,
    warp_perspective,
    warp_axis_aligned,
    upsample2d_align_corners,
    upflow8,
    avg_pool2d,
    coords_grid,
)
from .pad import NoPadder, CropPadder, ReplicatePadder, ResizePadder, make_padder  # noqa: F401
from .sampling import (  # noqa: F401
    sobol_1d,
    featuremap_coords,
    sobol_select_mask,
    masked_sobol_gather,
)
from .interpolation import (  # noqa: F401
    interp_flow,
    flow_warp_coords,
    chain_flow,
    bilinear_interpolate,
    forward_interpolate,
)
from .warp import warp_validity_mask  # noqa: F401
