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
            pure = inner._raw_step

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


def test_multi_target_chunk_matches_per_frame():
    """build_multi_track_chunk (one dispatch per T frames) must produce the
    SAME homography sequence and final state as T per-frame vmapped steps —
    the device-residency rewrite may not change semantics."""
    from woft_tpu.models.raft import init_raft_params
    from woft_tpu.pipeline import build_multi_track_chunk

    cfg = RaftConfig(variant="weighted", iters=1)
    tp = TrackerParams(padding_mode="nopad", redetection="always",
                       no_local_h=True)
    wp = WindowParams(size=S, margin=0.4, min_px=20)
    params = init_raft_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(3)
    base = jnp.asarray(rng.uniform(0, 255, (1, H_IMG, W_IMG, 3)),
                       jnp.float32)
    masks = np.zeros((2, H_IMG, W_IMG), bool)
    masks[0, 10:40, 10:50] = True
    masks[1, 50:90, 20:60] = True
    states = [window_init_state(params, cfg, tp, wp, base,
                                jnp.asarray(m)) for m in masks]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    T = 3
    frames = jnp.asarray(rng.uniform(0, 255, (T, 1, H_IMG, W_IMG, 3)),
                         jnp.float32)

    pure = build_window_track_step(cfg, tp, wp)._raw_step
    step = jax.jit(lambda p, s, f: jax.vmap(
        lambda si: pure(p, si, f))(s))
    s_ref, hs_ref = batched, []
    for t in range(T):
        s_ref, h, meta_ref = step(params, s_ref, frames[t])
        hs_ref.append(h)
    hs_ref = np.stack([np.asarray(h) for h in hs_ref])

    chunk = build_multi_track_chunk(cfg, tp, wp)
    s_chk, hs_chk, meta_chk = chunk(
        params, jax.tree.map(jnp.copy, batched), frames)

    np.testing.assert_allclose(np.asarray(hs_chk), hs_ref, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_chk), jax.tree.leaves(s_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert np.asarray(meta_chk["global_H_success"]).shape == (T, 2)

    # uint8-BGR in-graph conversion path == host-converted float path
    chunk_u8 = build_multi_track_chunk(cfg, tp, wp, bgr_u8=True)
    frames_u8 = jnp.asarray(
        np.asarray(frames, np.float32).astype(np.uint8)[..., ::-1])
    s_u8, hs_u8, _ = chunk_u8(
        params, jax.tree.map(jnp.copy, batched), frames_u8)
    del s_u8
    chunk_f = build_multi_track_chunk(cfg, tp, wp)
    _, hs_f, _ = chunk_f(
        params, jax.tree.map(jnp.copy, batched),
        jnp.asarray(np.asarray(frames, np.float32).astype(np.uint8)
                    .astype(np.float32)))
    np.testing.assert_allclose(np.asarray(hs_u8), np.asarray(hs_f),
                               atol=1e-5)


def test_shared_multi_step_matches_full_tracker():
    """The shared-flow multi-target mode (one full-frame flow, N vmapped
    fits — BASELINE config 4 'shared correlation volume') must agree with
    the single-target full tracker run per mask when the control never
    loses: target t's homography == build_track_step on mask t whenever
    both see the same pre-warp (here: identity, zero-motion oracle)."""
    from woft_tpu.tracker import build_track_step, tracker_init_state
    from woft_tpu.tracker.woft import build_shared_multi_step

    cfg = RaftConfig(variant="weighted", iters=1)
    tp = TrackerParams(padding_mode="nopad", redetection="always",
                       no_local_h=True)

    def tiny_flow(params, img1, img2, template_feats=None):
        # deterministic near-zero flow: identical for every caller
        H, W = img2.shape[1:3]
        gy = jnp.sin(jnp.arange(H) / 17.0)[None, :, None, None]
        gx = jnp.cos(jnp.arange(W) / 13.0)[None, None, :, None]
        return (0.05 * jnp.concatenate(
            [gx + 0 * gy, gy + 0 * gx], -1)
            * jnp.ones((1, H, W, 2)),
            jnp.ones((1, H, W, 1)))

    rng = np.random.default_rng(0)
    base_np = rng.uniform(0, 255, (1, H_IMG, W_IMG, 3)).astype(np.float32)
    frame_np = rng.uniform(0, 255, (1, H_IMG, W_IMG, 3)).astype(np.float32)
    masks_np = np.zeros((3, H_IMG, W_IMG), bool)
    masks_np[0, 10:40, 10:50] = True
    masks_np[1, 50:90, 20:60] = True
    masks_np[2, 20:70, 70:120] = True

    shared = build_shared_multi_step(cfg, tp, flow_fn=tiny_flow)
    state = tracker_init_state({}, cfg, tp, jnp.asarray(base_np),
                               jnp.asarray(masks_np[0]), encode=False)
    masks = jnp.asarray(masks_np.reshape(3, -1))
    h_last = jnp.tile(jnp.eye(3, dtype=jnp.float32), (3, 1, 1))
    _, h_last2, hs, meta = shared({}, state, masks, h_last,
                                  jnp.asarray(frame_np))
    assert hs.shape == (3, 3, 3)
    assert np.asarray(meta["global_H_success"]).shape == (3,)

    step = build_track_step(cfg, tp, flow_fn=tiny_flow)
    for t in range(3):
        # fresh device buffers each round: the CPU step donates its state,
        # which would invalidate a shared `base` array after the first call
        st = tracker_init_state({}, cfg, tp, jnp.asarray(base_np),
                                jnp.asarray(masks_np[t]), encode=False)
        _, h_ref, _ = step({}, st, jnp.asarray(frame_np))
        # vmapped vs single f32 QR takes different LAPACK paths; observed
        # jitter up to ~1e-4 on H entries of O(1) — semantics identical
        np.testing.assert_allclose(np.asarray(hs[t]), np.asarray(h_ref),
                                   atol=1e-3)

    # grouped fits (multi_fit_chunk < N forces the lax.map path, incl. an
    # all-False padding target) must reproduce the single-vmap results
    import dataclasses
    tp_chunked = dataclasses.replace(tp, multi_fit_chunk=2)
    shared_c = build_shared_multi_step(cfg, tp_chunked, flow_fn=tiny_flow)
    state_c = tracker_init_state({}, cfg, tp_chunked, jnp.asarray(base_np),
                                 jnp.asarray(masks_np[0]), encode=False)
    _, h_last_c, hs_c, meta_c = shared_c({}, state_c, masks, h_last,
                                         jnp.asarray(frame_np))
    np.testing.assert_allclose(np.asarray(hs_c), np.asarray(hs), atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(meta_c["global_H_success"]),
        np.asarray(meta["global_H_success"]))


def test_full_track_chunk_matches_per_frame():
    """build_full_track_chunk (scan over T frames) == T per-frame steps."""
    from woft_tpu.models.raft import init_raft_params
    from woft_tpu.pipeline import build_full_track_chunk
    from woft_tpu.tracker import build_track_step, tracker_init_state

    cfg = RaftConfig(variant="weighted", iters=1)
    tp = TrackerParams(padding_mode="nopad", redetection="always",
                       no_local_h=True)
    params = init_raft_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(5)
    base = jnp.asarray(rng.uniform(0, 255, (1, H_IMG, W_IMG, 3)),
                       jnp.float32)
    mask = np.zeros((H_IMG, W_IMG), bool)
    mask[24:72, 32:96] = True
    T = 3
    frames = jnp.asarray(rng.uniform(0, 255, (T, 1, H_IMG, W_IMG, 3)),
                         jnp.float32)

    # both init states BEFORE any step: the CPU step donates its state,
    # which would invalidate the shared `base` buffer mid-test
    state0 = tracker_init_state(params, cfg, tp, jnp.copy(base),
                                jnp.asarray(mask))
    state0b = tracker_init_state(params, cfg, tp, jnp.copy(base),
                                 jnp.asarray(mask))
    step = build_track_step(cfg, tp)
    s_ref, hs_ref = state0, []
    for t in range(T):
        s_ref, h, _ = step(params, s_ref, jnp.copy(frames[t]))
        hs_ref.append(np.asarray(h))

    chunk = build_full_track_chunk(cfg, tp)
    s_chk, hs_chk, meta = chunk(params, state0b, frames)
    np.testing.assert_allclose(np.asarray(hs_chk), np.stack(hs_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_chk.prev_h2init),
                               np.asarray(s_ref.prev_h2init), atol=1e-5)


def _write_jpg_seq(dirpath, n=5):
    """A small textured clip: base noise image translating 1 px/frame."""
    import cv2
    rng = np.random.default_rng(7)
    base = rng.uniform(0, 255, (H_IMG, W_IMG, 3)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 1.5)
    base = np.clip((base - base.mean()) * 3.0 + 127.5, 0, 255)
    paths = []
    for i in range(n):
        M = np.float32([[1, 0, i], [0, 1, 0.5 * i]])
        f = cv2.warpAffine(base, M, (W_IMG, H_IMG))
        p = str(dirpath / f"{i:05d}.jpg")
        cv2.imwrite(p, f.astype(np.uint8), [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_native_frameloader_matches_cv2(tmp_path):
    """The C++ threaded loader must return the same RGB float32 frames, in
    order, as the cv2 fallback decode."""
    woft_native = pytest.importorskip("woft_native")
    import cv2
    paths = _write_jpg_seq(tmp_path, n=6)
    loader = woft_native.FrameLoader(paths, n_threads=3, prefetch=2)
    got = []
    while True:
        f = loader.next_frame()
        if f is None:
            break
        got.append(np.asarray(f))
    assert len(got) == len(paths)
    for p, g in zip(paths, got):
        want = cv2.imread(p)[:, :, ::-1].astype(np.float32)
        assert g.shape == want.shape and g.dtype == np.float32
        # same libjpeg family; allow 1-LSB IDCT implementation slack
        assert np.abs(g - want).max() <= 1.0, (p, np.abs(g - want).max())


def test_native_frameloader_uint8_mode(tmp_path):
    """as_uint8=True must return uint8 RGB frames equal to the f32 path."""
    woft_native = pytest.importorskip("woft_native")
    paths = _write_jpg_seq(tmp_path, n=4)
    lf = woft_native.FrameLoader(paths, n_threads=2, prefetch=2)
    lu = woft_native.FrameLoader(paths, n_threads=2, prefetch=2, as_uint8=1)
    while True:
        f = lf.next_frame()
        u = lu.next_frame()
        assert (f is None) == (u is None)
        if f is None:
            break
        assert u.dtype == np.uint8 and f.dtype == np.float32
        np.testing.assert_array_equal(u.astype(np.float32), f)


def test_track_video_uint8_upload_matches_f32(tmp_path):
    """track_video(uint8_upload=True) must produce the same homographies
    as the float32 upload path (frames are 0..255 integers from JPEG)."""
    from woft_tpu.models.raft import init_raft_params
    from woft_tpu.pipeline import track_video
    from woft_tpu.tracker.window_step import window_params_for_mask

    paths = _write_jpg_seq(tmp_path, n=4)
    cfg = RaftConfig(variant="weighted", iters=1)
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    tp = TrackerParams(redetection="always", no_local_h=True,
                       padding_mode="nopad")
    mask = np.zeros((H_IMG, W_IMG), bool)
    mask[24:72, 32:96] = True
    wp = window_params_for_mask(mask, size=S, min_px=20.0)
    hs_f = track_video(params, cfg, tp, wp, tmp_path, mask, sync_every=2)
    hs_u = track_video(params, cfg, tp, wp, tmp_path, mask, sync_every=2,
                       uint8_upload=True)
    np.testing.assert_allclose(hs_u, hs_f, atol=1e-6)


def test_track_video_end_to_end(tmp_path):
    """track_video (BASELINE config 5 driver) over a jpg dir: native
    threaded decode -> device window steps -> deferred H fetches."""
    from woft_tpu.models.raft import init_raft_params
    from woft_tpu.pipeline import track_video
    from woft_tpu.tracker.window_step import window_params_for_mask

    paths = _write_jpg_seq(tmp_path, n=5)
    cfg = RaftConfig(variant="weighted", iters=1)
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    tp = TrackerParams(redetection="always", no_local_h=True,
                       padding_mode="nopad")
    mask = np.zeros((H_IMG, W_IMG), bool)
    mask[24:72, 32:96] = True
    wp = window_params_for_mask(mask, size=S, min_px=20.0)
    hs = track_video(params, cfg, tp, wp, tmp_path, mask, sync_every=2)
    assert hs.shape == (len(paths), 3, 3)
    assert np.isfinite(hs).all()
    assert np.allclose(hs[0], np.eye(3))
    # normalized homographies (h22 = 1) for every tracked frame
    assert np.allclose(hs[:, 2, 2], 1.0, atol=1e-5)


def test_shared_multi_tracker_class_api():
    """SharedMultiTracker (the user-facing shell for the shared-flow
    design) must reproduce the raw build_shared_multi_step results through
    both track() and track_chunk(), starting from uint8 BGR frames."""
    from woft_tpu.tracker import tracker_init_state
    from woft_tpu.tracker.woft import build_shared_multi_step
    from woft_tpu.pipeline import SharedMultiTracker

    cfg = RaftConfig(variant="weighted", iters=1)
    tp = TrackerParams(padding_mode="nopad", redetection="always")

    def tiny_flow(params, img1, img2, template_feats=None):
        H, W = img2.shape[1:3]
        gy = jnp.sin(jnp.arange(H) / 17.0)[None, :, None, None]
        gx = jnp.cos(jnp.arange(W) / 13.0)[None, None, :, None]
        return (0.05 * jnp.concatenate([gx + 0 * gy, gy + 0 * gx], -1)
                * jnp.ones((1, H, W, 2)),
                jnp.ones((1, H, W, 1)))

    rng = np.random.default_rng(1)
    base_u8 = rng.uniform(0, 255, (H_IMG, W_IMG, 3)).astype(np.uint8)
    f1_u8 = rng.uniform(0, 255, (H_IMG, W_IMG, 3)).astype(np.uint8)
    f2_u8 = rng.uniform(0, 255, (H_IMG, W_IMG, 3)).astype(np.uint8)
    masks_np = np.zeros((3, H_IMG, W_IMG), bool)
    masks_np[0, 10:40, 10:50] = True
    masks_np[1, 50:90, 20:60] = True
    masks_np[2, 20:70, 70:120] = True

    mt = SharedMultiTracker({}, cfg, tp, flow_fn=tiny_flow)
    mt.init(base_u8, masks_np)
    assert mt.tp.no_local_h and not mt.tp.host_fallback
    hs1, meta1 = mt.track(f1_u8)
    hs2, _ = mt.track(f2_u8)
    assert hs1.shape == (3, 3, 3) and meta1["global_H_success"].shape == (3,)

    # oracle: drive the raw step by hand with identical inputs
    tp_forced = mt.tp
    step = build_shared_multi_step(cfg, tp_forced, flow_fn=tiny_flow)
    state = tracker_init_state(
        {}, cfg, tp_forced,
        jnp.asarray(base_u8[:, :, ::-1].astype(np.float32))[None],
        jnp.asarray(masks_np[0]), encode=False)
    masks = jnp.asarray(masks_np.reshape(3, -1))
    h_last = jnp.tile(jnp.eye(3, dtype=jnp.float32), (3, 1, 1))
    state, h_last, r1, _ = step(
        {}, state, masks, h_last,
        jnp.asarray(f1_u8[:, :, ::-1].astype(np.float32))[None])
    state, h_last, r2, _ = step(
        {}, state, masks, h_last,
        jnp.asarray(f2_u8[:, :, ::-1].astype(np.float32))[None])
    np.testing.assert_allclose(hs1, np.asarray(r1), atol=1e-4)
    np.testing.assert_allclose(hs2, np.asarray(r2), atol=1e-4)

    # track_chunk: same two frames in one dispatch == the per-frame pair
    mt2 = SharedMultiTracker({}, cfg, tp, flow_fn=tiny_flow)
    mt2.init(base_u8, masks_np)
    hs_c, meta_c = mt2.track_chunk(np.stack([f1_u8, f2_u8]))
    assert hs_c.shape == (2, 3, 3, 3)
    np.testing.assert_allclose(hs_c[0], hs1, atol=1e-4)
    np.testing.assert_allclose(hs_c[1], hs2, atol=1e-4)
