from .corr_lookup import fused_corr_lookup, pad_pyramid  # noqa: F401
