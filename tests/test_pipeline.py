"""Streaming pipeline + multi-target tracker tests (CPU, oracle flow)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from woft_tpu.models.raft import RaftConfig
from woft_tpu.tracker import TrackerParams
from woft_tpu.tracker.window_step import (WindowParams,
                                          build_window_track_step,
                                          window_init_state)
from woft_tpu.pipeline import MultiTargetTracker

H_IMG, W_IMG = 96, 128
S = 64


def test_multi_target_tracks_three_boxes():
    cfg = RaftConfig(variant="weighted", iters=1)
    tp = TrackerParams(padding_mode="nopad", redetection="always")
    wp = WindowParams(size=S, margin=0.4, min_px=20)

    def zero_flow(params, img1, img2, template_feats=None):
        return (jnp.zeros((1, S, S, 2)), jnp.ones((1, S, S, 1)))

    rng = np.random.default_rng(0)
    frame = rng.uniform(0, 255, (H_IMG, W_IMG, 3)).astype(np.uint8)
    masks = np.zeros((3, H_IMG, W_IMG), bool)
    masks[0, 10:40, 10:50] = True
    masks[1, 50:90, 20:60] = True
    masks[2, 20:70, 70:120] = True

    # patch: multi-target with injected oracle flow
    import woft_tpu.pipeline as pl

    class OracleMT(MultiTargetTracker):
        def __init__(self, params, cfg, tp, wp):
            self.params = params
            self.cfg = cfg
            self.tp = TrackerParams(**{**tp.__dict__, "no_local_h": True})
            self.wp = wp
            inner = build_window_track_step(self.cfg, self.tp, wp,
                                            flow_fn=zero_flow)
            pure = inner.__wrapped__

            def batched(params, states, frame):
                return jax.vmap(lambda s: pure(params, s, frame))(states)

            self._step = jax.jit(batched, donate_argnums=(1,))
            self.states = None

        def init(self, frame_bgr, masks):
            frame = jnp.asarray(
                frame_bgr[:, :, ::-1].astype(np.float32))[None]
            states = [window_init_state(self.params, self.cfg, self.tp,
                                        self.wp, frame, jnp.asarray(m > 0),
                                        encode=False)
                      for m in masks]
            self.states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    mt = OracleMT({}, cfg, tp, wp)
    mt.init(frame, masks)
    for _ in range(2):
        hs, meta = mt.track(frame)
    assert hs.shape == (3, 3, 3)
    for n in range(3):
        assert np.allclose(hs[n], np.eye(3), atol=2e-3), hs[n]
    assert meta["global_H_success"].all()
