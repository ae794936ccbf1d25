"""Shared builder for the ablation config family.

The reference encodes its WACV-paper ablation table as 16 config files + 14
symlinks (ref:pytracking/configs/, SURVEY.md section 2.3). Here one builder
parameterises the same grid; each config file states only its deviation:

- estimator: weighted LSq (canonical) / plain LSq / IRLS-Huber
- redetection: inlier check (canonical) / neverwarp / alwayswarp
- downscale: 1 (canonical) / 2 / 3 / 4
"""

from pathlib import Path

from woft_tpu.config import Config, load_config
from woft_tpu.tracker import TrackerParams, WOFTTracker

_FLOW_DIR = Path(__file__).resolve().parent / "flow"


def build_config(estimator="wls_qr", redetection="inliers", downscale=0,
                 flow_config="wraft_large.py", padding_mode=None,
                 subsample_n=500, no_local_h=False, flow_overrides=None):
    conf = Config()
    conf.tracker_class = WOFTTracker
    conf.flow_config = load_config(_FLOW_DIR / flow_config)
    conf.flow_config.weights_postprocessing_fn = None
    for k, v in (flow_overrides or {}).items():
        setattr(conf.flow_config, k, v)
    if padding_mode is None:
        # downscaled inputs are rarely /8: use replicate padding like the
        # reference's WOFT_downscale_* configs (ref:WOFT_downscale_2x.py:63)
        padding_mode = "RAFT" if downscale else str(
            conf.flow_config.padding_mode or "nopad")
    conf.flow_config.padding_mode = padding_mode

    conf.downscale_inputs = downscale
    conf.tracker_params = TrackerParams(
        subsample_n=subsample_n,
        inlier_px=5.0,
        min_inlier_frac=0.2,
        no_prewarp_after_n=10,
        estimator=estimator,
        redetection=redetection,
        downscale=downscale,
        no_local_h=no_local_h,
        padding_mode=padding_mode,
    )
    return conf
