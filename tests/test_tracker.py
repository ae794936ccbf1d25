"""Tracker state-machine tests with an oracle flow function.

The flow network is injected through the L3 seam (``build_track_step``'s
``flow_fn``), so these tests exercise the full device pipeline — pre-warp,
TC validity masking, Sobol-500 gather, weighted QR fit, inlier check,
fallback ladder, lost-counter escalation — with controlled flow.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from woft_tpu.models.raft import RaftConfig
from woft_tpu.tracker import (
    TrackerParams,
    TrackerState,
    build_track_step,
    tracker_init_state,
)
from woft_tpu.geometry import np_h_proj
from woft_tpu.ops.warp import warp_perspective

H_IMG, W_IMG = 96, 128


def checker_frame():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (H_IMG, W_IMG, 3)).astype(np.float32)
    return img


def make_mask():
    mask = np.zeros((H_IMG, W_IMG), bool)
    mask[24:72, 32:96] = True
    return mask


def oracle_flow_factory(h_true_fn, noise=0.0, weight_fn=None):
    """Flow oracle: given the GT mapping current->template applied during
    the step, produce the template->current(-prewarped) flow the net would
    see. The tracker computes flow(template, prewarped_current); for a
    current frame satisfying ``x_template = H_true(x_cur)`` and prewarp by
    ``H_pw``, the observed point of template pixel p is
    ``H_pw(H_true^-1(p))``."""

    def flow_fn(params, img1, img2, template_feats=None):
        # params carries the GT transform for this call: (3,3) jnp array
        h = params["h_tmpl2obs"]                       # template -> observed
        hw = H_IMG * W_IMG
        xs = (jnp.arange(hw) % W_IMG).astype(jnp.float32)
        ys = (jnp.arange(hw) // W_IMG).astype(jnp.float32)
        src = jnp.stack([xs, ys, jnp.ones(hw)], axis=0)  # (3, HW)
        proj = h @ src
        proj = proj[:2] / proj[2:]
        flow = (proj - src[:2]).T.reshape(1, H_IMG, W_IMG, 2)
        if noise:
            flow = flow + noise * jax.random_normal_stub()
        if weight_fn is None:
            weights = jnp.ones((1, H_IMG, W_IMG, 1))
        else:
            weights = weight_fn()
        return flow, weights

    return flow_fn


@pytest.fixture(scope="module")
def setup():
    cfg = RaftConfig(variant="weighted", iters=2)
    tp = TrackerParams(padding_mode="nopad")
    template = checker_frame()
    mask = make_mask()
    return cfg, tp, template, mask


def test_track_identity(setup):
    cfg, tp, template, mask = setup
    step = build_track_step(cfg, tp, flow_fn=oracle_flow_factory(None))
    params = {"h_tmpl2obs": jnp.eye(3)}
    state = tracker_init_state(params, cfg, tp,
                               jnp.asarray(template)[None],
                               jnp.asarray(mask), encode=False)
    state, H, meta = step(params, state, jnp.asarray(template)[None])
    assert np.allclose(np.asarray(H), np.eye(3), atol=1e-3)
    assert bool(meta["global_H_success"])
    assert float(meta["inlier_frac"]) > 0.99


def test_track_known_homography(setup):
    """Frame = template warped by H_cur2tmpl^-1; tracker must recover it."""
    cfg, tp, template, mask = setup
    h_true = np.array([[0.98, 0.03, 4.0],
                       [-0.02, 1.01, -3.0],
                       [1e-5, -2e-5, 1.0]], np.float32)  # cur -> template

    # first step: prewarp is identity, so observed pts = H_true^-1(template)
    h_obs = np.linalg.inv(h_true).astype(np.float32)
    params = {"h_tmpl2obs": jnp.asarray(h_obs)}
    step = build_track_step(cfg, tp, flow_fn=oracle_flow_factory(None))
    state = tracker_init_state(params, cfg, tp,
                               jnp.asarray(template)[None],
                               jnp.asarray(mask), encode=False)

    frame = np.asarray(warp_perspective(
        jnp.asarray(template)[None], jnp.asarray(h_obs)))
    state, H, meta = step(params, state, jnp.asarray(frame))
    H = np.asarray(H)

    corners = np.array([[32, 24], [96, 24], [96, 72], [32, 72]], float).T
    err = np.linalg.norm(np_h_proj(H, corners) - np_h_proj(h_true, corners),
                         axis=0)
    assert err.max() < 0.1, err
    assert bool(meta["global_H_success"])
    assert int(np.asarray(state.n_lost)) == 0


def test_lost_counter_and_fallback(setup):
    """Garbage flow -> inlier check fails -> local fallback + lost count;
    after no_prewarp_after_n losses the pre-warp resets to identity
    (ref:YAOF:78-79,171-207; configs/WOFT.py:68)."""
    cfg, tp, template, mask = setup

    def garbage_flow(params, img1, img2, template_feats=None):
        hw = H_IMG * W_IMG
        key_x = (jnp.arange(hw) % W_IMG).astype(jnp.float32)
        # scrambled, inconsistent flow: no homography fits > 20% inliers
        flow = jnp.stack([jnp.sin(key_x * 12.9898) * 25.0,
                          jnp.cos(key_x * 78.233) * 25.0], -1)
        return flow.reshape(1, H_IMG, W_IMG, 2), jnp.ones((1, H_IMG, W_IMG, 1))

    step = build_track_step(cfg, tp, flow_fn=garbage_flow)
    params = {}
    state = tracker_init_state(params, cfg, tp,
                               jnp.asarray(template)[None],
                               jnp.asarray(mask), encode=False)
    frame = jnp.asarray(template)[None]
    for i in range(3):
        state, H, meta = step(params, state, frame)
        assert bool(meta["lost"])
        assert int(np.asarray(meta["N_lost"])) == i + 1
    # local fallback chains onto prev_H2init; everything stays finite
    assert np.isfinite(np.asarray(H)).all()

    # escalate past the reset horizon
    for _ in range(tp.no_prewarp_after_n):
        state, H, meta = step(params, state, frame)
    # pre-warp must now be identity (reset happened inside the step)
    assert np.allclose(np.asarray(meta["last_good_H2init"]), np.eye(3))


def test_host_fallback_matches_cond(setup):
    """host_fallback=True (separately-jitted fallback program, big-frame
    mode) must produce the same H / state trajectory as the lax.cond
    path, including on frames where the fallback fires."""
    cfg, tp, template, mask = setup

    def garbage_flow(params, img1, img2, template_feats=None):
        hw = H_IMG * W_IMG
        key_x = (jnp.arange(hw) % W_IMG).astype(jnp.float32)
        flow = jnp.stack([jnp.sin(key_x * 12.9898) * 25.0,
                          jnp.cos(key_x * 78.233) * 25.0], -1)
        return (flow.reshape(1, H_IMG, W_IMG, 2),
                jnp.ones((1, H_IMG, W_IMG, 1)))

    results = {}
    for host in (False, True):
        tph = TrackerParams(padding_mode="nopad", host_fallback=host)
        step = build_track_step(cfg, tph, flow_fn=garbage_flow)
        state = tracker_init_state({}, cfg, tph,
                                   jnp.asarray(template)[None],
                                   jnp.asarray(mask), encode=False)
        hs = []
        for _ in range(3):
            state, H, meta = step({}, state, jnp.asarray(template)[None])
            assert bool(np.asarray(meta["lost"]))
            hs.append(np.asarray(H))
        results[host] = (np.stack(hs), np.asarray(state.prev_h2init),
                         int(np.asarray(state.n_lost)))
    np.testing.assert_allclose(results[True][0], results[False][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(results[True][1], results[False][1],
                               rtol=1e-5, atol=1e-5)
    assert results[True][2] == results[False][2] == 3


def test_redetection_modes(setup):
    cfg, _, template, mask = setup

    def identity_flow(params, img1, img2, template_feats=None):
        return (jnp.zeros((1, H_IMG, W_IMG, 2)),
                jnp.ones((1, H_IMG, W_IMG, 1)))

    for mode, expect_lost in (("never", True), ("always", False)):
        tp = TrackerParams(redetection=mode, padding_mode="nopad",
                           no_local_h=True)
        step = build_track_step(cfg, tp, flow_fn=identity_flow)
        state = tracker_init_state({}, cfg, tp, jnp.asarray(template)[None],
                                   jnp.asarray(mask), encode=False)
        state, H, meta = step({}, state, jnp.asarray(template)[None])
        assert bool(meta["lost"]) == expect_lost, mode


def test_local_fallback_compose_order(setup):
    """Fallback with a NON-identity prev_h2init: the recovered pose must be
    prev_h2init ∘ H_flow (H_flow applied first, cur->prev), matching
    ref:YAOF:201 compose_H(H_flow, self.prev_H2init). The two orders
    diverge for non-commuting matrices — regression for the round-1 bug."""
    cfg, _, template, mask = setup
    tp = TrackerParams(redetection="never", padding_mode="nopad")

    # oracle flow maps prev-frame coords through A (prev -> cur)
    A = np.array([[1.0, 0.0, 5.0],
                  [0.0, 1.0, -3.0],
                  [0.0, 0.0, 1.0]], np.float32)
    # non-identity, non-commuting prev->init history
    Hp = np.array([[0.95, 0.10, 8.0],
                   [-0.08, 1.05, -6.0],
                   [2e-5, -1e-5, 1.0]], np.float32)

    params = {"h_tmpl2obs": jnp.asarray(A)}
    step = build_track_step(cfg, tp, flow_fn=oracle_flow_factory(None))
    base = tracker_init_state(params, cfg, tp,
                              jnp.asarray(template)[None],
                              jnp.asarray(mask), encode=False)
    state = TrackerState(
        template_img=base.template_img,
        template_feats=base.template_feats,
        template_mask=base.template_mask,
        prev_img=base.prev_img,
        prev_h2init=jnp.asarray(Hp),
        last_good_h2init=jnp.asarray(Hp),
        lost=base.lost,
        n_lost=base.n_lost)

    state, H, meta = step(params, state, jnp.asarray(template)[None])
    H = np.asarray(H)

    expected = Hp @ np.linalg.inv(A)          # apply inv(A)=cur->prev first
    expected /= expected[2, 2]
    corners = np.array([[32, 24], [96, 24], [96, 72], [32, 72]], float).T
    err = np.linalg.norm(np_h_proj(H, corners) - np_h_proj(expected, corners),
                         axis=0)
    assert err.max() < 0.05, (H, expected)

    # sanity: the wrong order would be far off
    wrong = np.linalg.inv(A) @ Hp
    wrong /= wrong[2, 2]
    werr = np.linalg.norm(
        np_h_proj(H, corners) - np_h_proj(wrong, corners), axis=0)
    assert werr.max() > 0.3


def test_visibility_mask_feeds_tc_validity(setup):
    """'weighted_masked' seam: a 3-tuple flow_fn's visibility mask removes
    TCs even at weight 1 (ref:weighted_raft.py:296-310)."""
    cfg, tp, template, mask = setup

    def flow_with_invisible_region(params, img1, img2, template_feats=None):
        flow = jnp.zeros((1, H_IMG, W_IMG, 2))
        # corrupt flow rows 24..48, full weight — only the visibility
        # mask can reject it
        flow = flow.at[:, 24:48, :, :].set(17.3)
        weights = jnp.ones((1, H_IMG, W_IMG, 1))
        vis = jnp.ones((1, H_IMG, W_IMG, 1))
        vis = vis.at[:, 24:48, :, :].set(0.0)
        return flow, weights, vis

    step = build_track_step(cfg, tp, flow_fn=flow_with_invisible_region)
    state = tracker_init_state({}, cfg, tp, jnp.asarray(template)[None],
                               jnp.asarray(mask), encode=False)
    state, H, meta = step({}, state, jnp.asarray(template)[None])
    assert np.allclose(np.asarray(H), np.eye(3), atol=1e-2), np.asarray(H)


def test_masked_config_loads():
    from pathlib import Path
    from woft_tpu.config import load_config
    conf = load_config(Path(__file__).resolve().parent.parent
                       / "woft_tpu/configs/WOFT_masked.py")
    assert conf.flow_config.raft_type == "weighted_masked"


def test_weight_masking_rejects_outlier_region(setup):
    """Zero-weight region with corrupted flow must not perturb the fit."""
    cfg, tp, template, mask = setup

    def flow_with_bad_region(params, img1, img2, template_feats=None):
        flow = jnp.zeros((1, H_IMG, W_IMG, 2))
        # corrupt flow rows 24..48 but weight them ~0
        flow = flow.at[:, 24:48, :, :].set(21.7)
        weights = jnp.ones((1, H_IMG, W_IMG, 1))
        weights = weights.at[:, 24:48, :, :].set(1e-6)
        return flow, weights

    step = build_track_step(cfg, tp, flow_fn=flow_with_bad_region)
    state = tracker_init_state({}, cfg, tp, jnp.asarray(template)[None],
                               jnp.asarray(mask), encode=False)
    state, H, meta = step({}, state, jnp.asarray(template)[None])
    assert np.allclose(np.asarray(H), np.eye(3), atol=1e-2), np.asarray(H)


def test_sparse_weight_path_matches_dense():
    """The sparse weight-head path (head + convex upsample evaluated only
    at solver cells) must reproduce the dense path's fit exactly."""
    import jax
    from woft_tpu.models.raft import init_raft_params

    cfg = RaftConfig(variant="weighted", iters=2)
    params = init_raft_params(jax.random.PRNGKey(3), cfg)
    template = checker_frame()
    mask = make_mask()
    frame = warp_perspective(
        jnp.asarray(template)[None],
        jnp.asarray(np.array([[1.0, 0.01, 1.5], [0.0, 1.0, -0.8],
                              [0, 0, 1.0]], np.float32)))

    for redet in ("always", "never"):
        hs = {}
        for sparse in (False, True):
            tp = TrackerParams(padding_mode="nopad", redetection=redet,
                               sparse_weights=sparse)
            step = build_track_step(cfg, tp)
            state = tracker_init_state(params, cfg, tp,
                                       jnp.asarray(template)[None],
                                       jnp.asarray(mask))
            _, H, meta = step(params, state, frame)
            hs[sparse] = np.asarray(H)
            assert np.isfinite(hs[sparse]).all()
        np.testing.assert_allclose(hs[True], hs[False], atol=1e-4,
                                   rtol=1e-4)
