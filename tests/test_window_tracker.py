"""Device-resident window tracker: transform-chain and smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from woft_tpu.models.raft import RaftConfig
from woft_tpu.tracker import TrackerParams
from woft_tpu.tracker.window_step import (
    WindowParams,
    _search_crop_h as _search_crop_h_pub,
    build_window_track_step,
    window_init_state,
)

H_IMG, W_IMG = 96, 128
S = 64


@pytest.fixture(scope="module")
def frame_and_mask():
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.uniform(0, 255, (1, H_IMG, W_IMG, 3)),
                        jnp.float32)
    mask = np.zeros((H_IMG, W_IMG), bool)
    mask[30:70, 40:100] = True
    return frame, mask


def zero_flow(params, img1, img2, template_feats=None):
    return (jnp.zeros((1, S, S, 2)), jnp.ones((1, S, S, 1)))


def test_zero_flow_identity_roundtrip(frame_and_mask):
    """With exact-zero window flow, the conjugation chain must return the
    prior exactly: H stays identity regardless of crop choice."""
    frame, mask = frame_and_mask
    cfg = RaftConfig(variant="weighted", iters=1)
    tp = TrackerParams(padding_mode="nopad", no_local_h=True)
    wp = WindowParams(size=S, margin=0.4, min_px=20)

    state = window_init_state({}, cfg, tp, wp, frame,
                              jnp.asarray(mask), encode=False)
    step = build_window_track_step(cfg, tp, wp, flow_fn=zero_flow)

    for _ in range(3):
        state, h, meta = step({}, state, frame)
        assert np.allclose(np.asarray(h), np.eye(3), atol=2e-3), np.asarray(h)
        assert bool(np.asarray(meta["global_H_success"]))


def test_known_translation(frame_and_mask):
    """Window flow consistent with a pure translation must recover it.

    Build the oracle in window coordinates from the true full-frame H and
    the crops the step chooses (provided via closure capture of the meta)."""
    frame, mask = frame_and_mask
    cfg = RaftConfig(variant="weighted", iters=1)
    tp = TrackerParams(padding_mode="nopad", no_local_h=True)
    wp = WindowParams(size=S, margin=0.4, min_px=20)

    # true motion: shift by (3, -2): H_cur2init maps cur -> init
    h_true = np.array([[1, 0, 3.0], [0, 1, -2.0], [0, 0, 1]], np.float32)

    from woft_tpu.ops.warp import warp_perspective
    frame2 = warp_perspective(frame, jnp.asarray(np.linalg.inv(h_true)))

    captured = {}

    def oracle_flow(params, img1, img2, template_feats=None):
        # img2 is the pre-warped current window; the residual mapping to
        # the template window is h_pw2tmpl = h_tmpl_crop H_true
        # inv(h_crop) inv(h_prior). Compute the flow it implies.
        h_res = captured["h_residual"]                    # (3,3)
        xs = (jnp.arange(S * S) % S).astype(jnp.float32)
        ys = (jnp.arange(S * S) // S).astype(jnp.float32)
        pts = jnp.stack([xs, ys, jnp.ones(S * S)], axis=0)
        # flow maps template-window pixels to pre-warped-current pixels:
        # the inverse of the residual
        proj = jnp.linalg.inv(h_res) @ pts
        proj = proj[:2] / proj[2:]
        flow = (proj - pts[:2]).T.reshape(1, S, S, 2)
        return flow, jnp.ones((1, S, S, 1))

    state = window_init_state({}, cfg, tp, wp, frame,
                              jnp.asarray(mask), encode=False)
    h_tmpl_crop = np.asarray(state["h_tmpl_crop"])

    # pre-compute what the step will choose: replicate its crop+prior math
    from woft_tpu.tracker.window_step import _search_crop_h
    h_crop = np.asarray(_search_crop_h(jnp.eye(3), state["tmpl_corners"],
                                       (H_IMG, W_IMG), wp))
    h_prior = h_tmpl_crop @ np.eye(3) @ np.linalg.inv(h_crop)
    h_prior /= h_prior[2, 2]
    h_win_true = h_tmpl_crop @ h_true @ np.linalg.inv(h_crop)
    h_res = h_win_true @ np.linalg.inv(h_prior)
    captured["h_residual"] = jnp.asarray((h_res / h_res[2, 2]).astype(
        np.float32))

    step = build_window_track_step(cfg, tp, wp, flow_fn=oracle_flow)
    state, h, meta = step({}, state, frame2)
    h = np.asarray(h)
    assert np.allclose(h, h_true, atol=5e-3), h
    assert bool(np.asarray(meta["global_H_success"]))


def test_with_aspect_grows_never_shrinks():
    from woft_tpu.geometry.bbox import Bbox
    wide = Bbox.from_xywh((10, 20, 100, 40))
    sq = wide.with_aspect(1.0)
    assert (sq.w, sq.h) == (100, 100)
    assert sq.tl_x == 10 and abs(sq.get_center()[1] - wide.get_center()[1]) <= 1
    tall = Bbox.from_xywh((0, 0, 30, 90))
    sq = tall.with_aspect(1.0)
    assert (sq.w, sq.h) == (90, 90)
    already = Bbox.from_xywh((5, 5, 64, 64)).with_aspect(1.0)
    assert (already.w, already.h) == (64, 64)


def test_square_crop_isotropic(frame_and_mask):
    """square=True (default) must yield equal x/y scales in the crop
    homography for an anisotropic target; square=False reproduces the old
    anisotropic squeeze."""
    frame, mask = frame_and_mask
    corners = jnp.asarray([[40.0, 30.0], [100.0, 30.0],
                           [100.0, 70.0], [40.0, 70.0]])   # 60x40 bbox
    wp_sq = WindowParams(size=S, margin=0.4, min_px=20, square=True)
    wp_an = WindowParams(size=S, margin=0.4, min_px=20, square=False)
    h_sq = np.asarray(_search_crop_h_pub(jnp.eye(3), corners,
                                         (H_IMG, W_IMG), wp_sq))
    h_an = np.asarray(_search_crop_h_pub(jnp.eye(3), corners,
                                         (H_IMG, W_IMG), wp_an))
    assert np.isclose(h_sq[0, 0], h_sq[1, 1]), h_sq
    assert h_an[0, 0] < h_an[1, 1]    # wide bbox squeezed harder in x

    # template crop path agrees
    cfg = RaftConfig(variant="weighted", iters=1)
    tp = TrackerParams(padding_mode="nopad")
    state = window_init_state({}, cfg, tp, wp_sq, frame,
                              jnp.asarray(mask), encode=False)
    h_tmpl = np.asarray(state["h_tmpl_crop"])
    assert np.isclose(h_tmpl[0, 0], h_tmpl[1, 1]), h_tmpl


def _tiny_window_config(**over):
    """Host-side WOFTWindowTracker config with a tiny random-weight RAFT."""
    from woft_tpu.config import Config
    from woft_tpu.flow.wrapper import RaftFlow
    from woft_tpu.tracker import TrackerParams
    from woft_tpu.tracker.window import WOFTWindowTracker

    conf = Config()
    conf.tracker_class = WOFTWindowTracker
    flow = Config()
    flow.of_class = RaftFlow
    flow.raft_type = "weighted"
    flow.class_params = Config()
    flow.class_params.small = False
    flow.class_params.weight_head_structure = [(32, 3)]
    flow.iters = 1
    flow.padding_mode = "nopad"
    flow.precision = "default"
    conf.flow_config = flow
    conf.tracker_params = TrackerParams(padding_mode="nopad",
                                        subsample_n=100, no_local_h=True)
    conf.window_size = 64
    conf.window_margin = 0.5
    conf.min_window_px = 20
    for k, v in over.items():
        setattr(conf, k, v)
    return conf


def test_native_scale_window_is_lossless_when_small():
    """window_native_scale: a target whose margin-padded bbox fits the cap
    gets per-sequence dims at EXACTLY native scale (isotropic, s == 1) —
    the capability the fixed-budget mode trades away
    (ref:WOFT_window.py:37-44 native-resolution crops)."""
    conf = _tiny_window_config(window_native_scale=True,
                               window_max_px=128, window_snap_px=32)
    tracker = conf.tracker_class(conf)
    rng = np.random.default_rng(1)
    frame = rng.uniform(0, 255, (160, 224, 3)).astype(np.uint8)
    mask = np.zeros((160, 224), np.uint8)
    mask[60:100, 80:140] = 1          # 60x40 bbox -> +50% margins = 120x80

    tracker.init(frame, mask)
    # ceil-snap to 32: 120 -> 128 wide, 80 -> 96 tall; scale exactly 1
    assert tracker.win_hw == (96, 128), tracker.win_hw
    h = np.asarray(tracker.h_tmpl_crop)
    assert np.isclose(h[0, 0], 1.0) and np.isclose(h[1, 1], 1.0), h
    assert np.allclose(h[[0, 1], [1, 0]], 0.0), h   # pure translation

    # per-frame search region keeps the fixed native source size
    h_cur, meta = tracker.track(frame)
    assert np.isfinite(h_cur).all()
    sw, sh = meta.search_bbox[2], meta.search_bbox[3]
    assert np.isclose(sw, 128) and np.isclose(sh, 96), meta.search_bbox


def test_native_scale_window_caps_isotropically():
    """Above the cap the crop downsizes by ONE exact isotropic factor on
    both axes (the r2 lesson: anisotropic squeeze costs accuracy)."""
    conf = _tiny_window_config(window_native_scale=True,
                               window_max_px=64, window_snap_px=32)
    tracker = conf.tracker_class(conf)
    rng = np.random.default_rng(1)
    frame = rng.uniform(0, 255, (160, 224, 3)).astype(np.uint8)
    mask = np.zeros((160, 224), np.uint8)
    mask[60:100, 80:140] = 1          # margin-padded native box = 120x80

    tracker.init(frame, mask)
    wh, ww = tracker.win_hw
    assert max(wh, ww) <= 64, tracker.win_hw
    h = np.asarray(tracker.h_tmpl_crop)
    s = 64 / 120.0
    assert np.isclose(h[0, 0], s) and np.isclose(h[1, 1], s), (h, s)


def test_window_sparse_weight_path_matches_dense():
    """Window-tracker sparse weight-head path == dense path."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from woft_tpu.models.raft import RaftConfig, init_raft_params
    from woft_tpu.tracker import TrackerParams
    from woft_tpu.tracker.window_step import (WindowParams,
                                              build_window_track_step,
                                              window_init_state)

    cfg = RaftConfig(variant="weighted", iters=2)
    params = init_raft_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.uniform(0, 255, (1, 96, 128, 3)), jnp.float32)
    mask = np.zeros((96, 128), bool)
    mask[30:70, 40:100] = True
    wp = WindowParams(size=64, margin=0.4, min_px=20)

    hs = {}
    for sparse in (False, True):
        tp = TrackerParams(padding_mode="nopad", redetection="always",
                           sparse_weights=sparse)
        step = build_window_track_step(cfg, tp, wp)
        state = window_init_state(params, cfg, tp, wp, frame,
                                  jnp.asarray(mask))
        _, H, _ = step(params, state, frame)
        hs[sparse] = np.asarray(H)
        assert np.isfinite(hs[sparse]).all()
    np.testing.assert_allclose(hs[True], hs[False], atol=1e-4, rtol=1e-4)
