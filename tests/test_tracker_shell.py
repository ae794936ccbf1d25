"""Host-shell behaviours: fast-forward resume, downscale compensation."""

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from woft_tpu.config import Config
from woft_tpu.tracker import TrackerParams, WOFTTracker

pytest.importorskip("cv2")

H_IMG, W_IMG = 96, 128


def make_tracker(downscale=0):
    conf = Config()
    flow = Config()
    from woft_tpu.flow.wrapper import RaftFlow
    flow.of_class = RaftFlow
    flow.raft_type = "weighted"
    flow.class_params = Config()
    flow.class_params.small = False
    flow.class_params.weight_head_structure = [(16, 3)]
    flow.iters = 1
    flow.padding_mode = "RAFT" if downscale else "nopad"
    flow.precision = "default"
    conf.flow_config = flow
    conf.tracker_params = TrackerParams(
        padding_mode=str(flow.padding_mode), subsample_n=64,
        downscale=downscale, redetection="always", no_local_h=True)
    return WOFTTracker(conf)


@pytest.fixture(scope="module")
def clip():
    rng = np.random.default_rng(0)
    frames = [rng.uniform(0, 255, (H_IMG, W_IMG, 3)).astype(np.uint8)
              for _ in range(3)]
    mask = np.zeros((H_IMG, W_IMG), np.uint8)
    mask[24:72, 32:96] = 255
    return frames, mask


def test_fast_forward_resume(clip):
    """set_fast_meta re-injects a stored result and skips recomputation
    (ref:YAOF_tracker_single_control.py:49-76)."""
    frames, mask = clip
    tracker = make_tracker()
    tracker.init(frames[0], mask)

    stored = SimpleNamespace()
    stored.estim_H_current2template = np.diag([1.02, 0.98, 1.0])
    tracker.set_fast_meta(stored)

    h, meta = tracker.track(frames[1])
    assert np.allclose(h, stored.estim_H_current2template)
    assert meta is stored
    # state advanced: tracking continues from the injected H
    assert np.allclose(np.asarray(tracker.state.last_good_h2init),
                       stored.estim_H_current2template, atol=1e-6)
    h2, meta2 = tracker.track(frames[2])
    assert np.isfinite(h2).all()


def test_downscale_compensation(clip):
    """Output H must be expressed at the ORIGINAL resolution
    (ref:YAOF:280-283)."""
    frames, mask = clip
    tracker = make_tracker(downscale=2)
    tracker.init(frames[0], mask)
    h, meta = tracker.track(frames[0])  # same frame: H ~ identity-ish
    assert h.shape == (3, 3)
    assert np.isfinite(h).all()
    # compensation preserves identity exactly: D^-1 I D = I
    # (tracking the identical frame with 'always' redetection)
    assert abs(h[0, 2]) < W_IMG  # translation expressed in full-res pixels
