from .woft import (  # noqa: F401
    TrackerParams,
    TrackerState,
    WOFTTracker,
    build_track_step,
    tracker_init_state,
)
