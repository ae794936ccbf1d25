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

    # window-mode ckpt preference (r5): the v5 multi-scale fine-tune wins
    # the WINDOW 720p eval on every metric (1.315/0.81/2.26 vs v4's
    # 1.349/0.78/2.78 — RESULTS.md r5) while LOSING full-frame, so only
    # this config prefers it; WOFT_WRAFT_CKPT still overrides everything
    import os
    _v5 = (Path(__file__).resolve().parent.parent.parent
           / "weights" / "wraft_tpu_v5")
    if _v5.exists() and not os.environ.get("WOFT_WRAFT_CKPT"):
        conf.flow_config.model = _v5

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
