"""Canonical WOFT tracker config.

Twin of ref:pytracking/configs/
YAOFT_single_control_repRAFT_sub500_noreliableinl_wLSq.py (symlinked as
configs/WOFT.py upstream): WeightedRAFT flow, Sobol-500 subsampling,
weighted-QR homography fit, 5 px / 20% inlier redetection check, pre-warp
reset after 10 lost frames.
"""

from pathlib import Path

from woft_tpu.config import Config, load_config
from woft_tpu.tracker import TrackerParams, WOFTTracker


def get_config():
    conf = Config()

    conf.tracker_class = WOFTTracker
    conf.flow_config = load_config(
        Path(__file__).resolve().parent / "flow" / "wraft_large.py")
    conf.flow_config.weights_postprocessing_fn = None

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
