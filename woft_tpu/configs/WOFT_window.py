"""Search-window WOFT config (fixed 256px window, resolution-independent).

Twin of the reference's WOFTWindow variant (ref:pytracking/tracker/
WOFT_window.py) re-designed for static shapes: the search region warps into
a fixed window (see tracker/window.py and the fully device-resident
tracker/window_step.py).
"""

from pathlib import Path

from woft_tpu.config import Config, load_config
from woft_tpu.tracker import TrackerParams
from woft_tpu.tracker.window import WOFTWindowTracker


def get_config():
    conf = Config()

    conf.tracker_class = WOFTWindowTracker
    conf.flow_config = load_config(
        Path(__file__).resolve().parent / "flow" / "wraft_large.py")
    conf.flow_config.weights_postprocessing_fn = None

    # deterministic named config: window-size overrides go through
    # bench.py's WOFT_BENCH_WINDOW knob or an explicit config variant
    # (WOFT_window_384.py), never the environment
    conf.window_size = 256
    conf.window_margin = 0.5
    conf.min_window_px = 160

    conf.tracker_params = TrackerParams(
        subsample_n=500,
        inlier_px=5.0,
        min_inlier_frac=0.2,
        no_prewarp_after_n=10,
        estimator="wls_qr",
        redetection="inliers",
        padding_mode="nopad",
    )
    return conf
