"""Native-scale search-window config (variable per-sequence window dims).

Capability twin of the reference's native-resolution variable-size crops
(ref:pytracking/tracker/WOFT_window.py:37-44: search bbox = template bbox
+ margins, min 8*20 px, cropped at native scale) under XLA static shapes:
the window dims are chosen ONCE per sequence from the margin-padded
template bbox — snapped to 32 px so distinct compile shapes stay few,
capped at ``window_max_px`` — and the crop scale is exactly isotropic and
exactly 1 whenever the native region fits the cap (a lossless crop for
small targets; the fixed-budget WOFT_window config would resample them).
Cost: per-frame compute scales with the target's native size up to the
cap, and each distinct snapped shape is its own compile (5-15 min through
the axon tunnel — prefer the fixed-budget config for latency-sensitive
first runs).
"""

from pathlib import Path

from woft_tpu.config import load_config


def get_config():
    conf = load_config(Path(__file__).resolve().parent / "WOFT_window.py")
    conf.window_native_scale = True
    conf.window_max_px = 512
    conf.window_snap_px = 32
    return conf
