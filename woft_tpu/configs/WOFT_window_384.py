"""Accuracy-tier search-window config: 384px window.

Same pipeline as WOFT_window (ref:pytracking/tracker/WOFT_window.py twin),
but with a 384px window and tighter margin: the window->frame scale factor
dominates window-mode corner error (a 1px window-space error maps to
~1/scale frame pixels), so the accuracy tier trades ~2x window-step cost
for ~1.9x finer effective resolution over the target.
"""

from pathlib import Path

from woft_tpu.config import load_config


def get_config():
    conf = load_config(Path(__file__).resolve().parent / "WOFT_window.py")
    conf.window_size = 384
    conf.window_margin = 0.35
    return conf
