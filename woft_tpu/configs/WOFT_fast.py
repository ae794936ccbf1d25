"""Speed-tier canonical WOFT: block-local correlation + bf16 model.

Same tracker logic as WOFT.py; the flow network runs with
``corr_impl='local'`` (models/corr.py:build_local_corr — block-shared
recentered correlation windows, the framework's compiled Pallas kernel) and
bf16 matmuls. Lookups are bit-exact vs the canonical all-pairs path while
the post-prewarp flow residual stays within ±local_margin 1/8-res cells
(default 16 -> ±128 full-res px, the normal tracking regime); beyond that
the window saturates instead of sampling the far field — prefer WOFT.py
when frames routinely jump more than that between redetections.
"""

from pathlib import Path

from woft_tpu.config import load_config


def get_config():
    conf = load_config(Path(__file__).resolve().parent / "WOFT.py")
    conf.flow_config.corr_impl = "local"
    conf.flow_config.local_margin = 16
    conf.flow_config.precision = "bf16"
    conf.name = "WOFT_fast"
    return conf
