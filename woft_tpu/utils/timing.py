"""Per-stage timing (ref:pytracking/utils/timing.py).

``time_measurer`` is the host wall clock; ``device_time_measurer`` is the
TPU analogue of the reference's ``cuda_time_measurer`` — it blocks on
outstanding device work (``block_until_ready``) around the measured region.
For deep profiles use ``jax.profiler.trace`` (SURVEY.md section 5.1).
"""

import inspect
import logging
import time

logger = logging.getLogger(__name__)

_UNITS = {"s": 1.0, "ms": 1000.0, "us": 1e6}


class time_measurer:
    """Call to get elapsed time; usable as a context manager that logs."""

    def __init__(self, units="s"):
        self.multiplier = _UNITS[units]
        self.units = units
        self.start = time.perf_counter()

    def __call__(self):
        return (time.perf_counter() - self.start) * self.multiplier

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *args):
        caller = inspect.currentframe().f_back
        mod = caller.f_globals.get("__name__", "?")
        logging.getLogger(mod).debug("elapsed: %.3f%s", self(), self.units)


class device_time_measurer(time_measurer):
    """Wall clock that synchronises the device before start and stop."""

    def __init__(self, units="s", sync_value=None):
        self._sync(sync_value)
        super().__init__(units)

    @staticmethod
    def _sync(value):
        import jax
        if value is not None:
            jax.block_until_ready(value)
        else:
            jax.effects_barrier()

    def stop(self, value=None):
        self._sync(value)
        return self()
