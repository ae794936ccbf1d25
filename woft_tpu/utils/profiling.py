"""Profiling helpers (the reference's per-stage debug timers, TPU-style).

The reference wraps every tracker stage in wall-clock timers
(SURVEY.md section 5.1); inside one jitted step that's the profiler's job:
``trace_step`` records an xprof trace of N steps for TensorBoard/xprof,
and ``stage_timer`` provides the host-side ms log lines around un-jitted
stages.
"""

import contextlib
import logging

logger = logging.getLogger(__name__)


def trace_step(step_fn, args, *, log_dir="/tmp/woft_xprof", n=3):
    """Run ``step_fn(*args)`` n times under a profiler trace.

    Returns the last result; the trace lands in ``log_dir`` for xprof /
    TensorBoard. Chain-dependent steps should pass updated args themselves.
    """
    import jax

    with jax.profiler.trace(log_dir):
        out = None
        for _ in range(n):
            out = step_fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
    logger.info("xprof trace written to %s", log_dir)
    return out


@contextlib.contextmanager
def stage_timer(name, sync_value=None):
    """Host-side stage timer with the reference's debug-log surface."""
    import time

    start = time.perf_counter()
    yield
    if sync_value is not None:
        import jax
        jax.block_until_ready(sync_value)
    logger.debug("%s: %.1fms", name, 1000 * (time.perf_counter() - start))
