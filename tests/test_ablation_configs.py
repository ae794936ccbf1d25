"""The paper's ablation table (01-12) must be reproducible from configs:
every alias loads, and each new solver/backend surface smoke-tracks.
(ref:pytracking/configs/ symlink table, SURVEY.md section 2.3)."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from woft_tpu.config import load_config
from woft_tpu.tracker import TrackerParams, build_track_step, \
    tracker_init_state
from woft_tpu.models.raft import RaftConfig
from woft_tpu.geometry import np_h_proj

CONFIG_DIR = Path(__file__).resolve().parent.parent / "woft_tpu/configs"
ABLATIONS = sorted(CONFIG_DIR.glob("ablation_*.py"))

H_IMG, W_IMG = 96, 128


def test_all_twelve_ablations_present():
    assert len(ABLATIONS) == 12, [a.name for a in ABLATIONS]


@pytest.mark.parametrize("path", ABLATIONS, ids=lambda p: p.stem)
def test_ablation_config_loads(path):
    conf = load_config(path)
    assert conf.tracker_class is not None
    assert conf.flow_config
    tp = conf.tracker_params
    assert isinstance(tp, TrackerParams)
    # spot-check the deviations that define the grid
    name = path.stem
    if name == "ablation_01":
        assert tp.estimator == "plain_qr" and tp.redetection == "never"
    if name == "ablation_06-WOFT":
        assert tp.estimator == "wls_qr" and tp.redetection == "inliers"
    if name == "ablation_08":
        assert tp.estimator == "irls_huber"
    if name in ("ablation_09", "ablation_11"):
        assert tp.estimator == "cvransac"
        assert tp.ransac_thr == 3.0 and tp.ransac_iters == 10000
    if name in ("ablation_10", "ablation_11", "ablation_12"):
        from woft_tpu.flow.external import ExternalFlowWrapper
        assert conf.flow_config.of_class is ExternalFlowWrapper
    if name in ("ablation_10", "ablation_11"):
        assert conf.flow_config.use_weight_head is False


def _oracle_flow(h_obs):
    h = jnp.asarray(h_obs)

    def flow_fn(params, img1, img2, template_feats=None):
        hw = H_IMG * W_IMG
        xs = (jnp.arange(hw) % W_IMG).astype(jnp.float32)
        ys = (jnp.arange(hw) // W_IMG).astype(jnp.float32)
        src = jnp.stack([xs, ys, jnp.ones(hw)], axis=0)
        proj = h @ src
        proj = proj[:2] / proj[2:]
        flow = (proj - src[:2]).T.reshape(1, H_IMG, W_IMG, 2)
        return flow, jnp.ones((1, H_IMG, W_IMG, 1))

    return flow_fn


def _setup_track(tp, h_obs):
    rng = np.random.default_rng(0)
    template = rng.uniform(0, 255, (H_IMG, W_IMG, 3)).astype(np.float32)
    mask = np.zeros((H_IMG, W_IMG), bool)
    mask[24:72, 32:96] = True
    cfg = RaftConfig(variant="weighted", iters=2)
    step = build_track_step(cfg, tp, flow_fn=_oracle_flow(h_obs))
    state = tracker_init_state({}, cfg, tp, jnp.asarray(template)[None],
                               jnp.asarray(mask), encode=False)
    return step, state, template


def test_cvransac_estimator_recovers_h():
    """ablation_09 path: the cv2-RANSAC pure_callback inside the jitted
    step recovers a known homography."""
    h_true = np.array([[0.98, 0.03, 4.0],
                       [-0.02, 1.01, -3.0],
                       [1e-5, -2e-5, 1.0]], np.float32)
    h_obs = np.linalg.inv(h_true).astype(np.float32)
    tp = TrackerParams(estimator="cvransac", padding_mode="nopad",
                       no_local_h=True)
    step, state, template = _setup_track(tp, h_obs)
    state, H, meta = step({}, state, jnp.asarray(template)[None])
    corners = np.array([[32, 24], [96, 24], [96, 72], [32, 72]], float).T
    err = np.linalg.norm(
        np_h_proj(np.asarray(H), corners) - np_h_proj(h_true, corners),
        axis=0)
    assert err.max() < 0.1, err
    assert bool(meta["global_H_success"])


def test_trs_estimator_recovers_similarity():
    ang = 0.05
    s = 1.02
    h_true = np.array([[s * np.cos(ang), -s * np.sin(ang), 3.0],
                       [s * np.sin(ang), s * np.cos(ang), -2.0],
                       [0.0, 0.0, 1.0]], np.float32)
    h_obs = np.linalg.inv(h_true).astype(np.float32)
    tp = TrackerParams(estimator="trs", padding_mode="nopad",
                       no_local_h=True)
    step, state, template = _setup_track(tp, h_obs)
    state, H, meta = step({}, state, jnp.asarray(template)[None])
    corners = np.array([[32, 24], [96, 24], [96, 72], [32, 72]], float).T
    err = np.linalg.norm(
        np_h_proj(np.asarray(H), corners) - np_h_proj(h_true, corners),
        axis=0)
    assert err.max() < 0.2, err


def test_external_wrapper_flow_fn_contract():
    """make_flow_fn: flow from the backend, weights from the cost-volume
    head (or uniform in the noweights ablation)."""
    from woft_tpu.config import Config
    from woft_tpu.flow.external import ExternalFlowWrapper

    def toy_backend(img1, img2):
        B, H, W, _ = img1.shape
        flow = jnp.ones((B, H, W, 2)) * 1.5
        cv = jnp.ones((B, H // 8, W // 8, 49)) * 0.1
        return flow, cv

    conf = Config()
    conf.backend_fn = toy_backend
    conf.use_weight_head = False
    wrapper = ExternalFlowWrapper(conf)
    flow_fn = wrapper.make_flow_fn()
    img = jnp.zeros((1, 64, 64, 3))
    flow, weights = flow_fn({}, img, img)
    assert flow.shape == (1, 64, 64, 2)
    assert weights.shape == (1, 64, 64, 1)
    assert np.allclose(np.asarray(weights), 1.0)   # noweights -> uniform


SHIPPED_HEAD = Path("/root/reference/pytracking/weights/liteflownet2_v2/"
                    "wraft_weights-ep04-end.pth")


@pytest.mark.skipif(not SHIPPED_HEAD.exists(),
                    reason="shipped liteflownet2 weight head unavailable")
def test_external_wrapper_with_shipped_head():
    from woft_tpu.config import Config
    from woft_tpu.flow.external import ExternalFlowWrapper

    def make_backend(scale):
        def toy_backend(img1, img2):
            B, H, W, _ = img1.shape
            flow = jnp.zeros((B, H, W, 2))
            cv = scale * jnp.linspace(0, 1, B * (H // 8) * (W // 8) * 49
                                      ).reshape(B, H // 8, W // 8, 49
                                                ).astype(jnp.float32)
            return flow, cv
        return toy_backend

    outs = []
    for scale in (0.05, 0.2):
        conf = Config()
        conf.backend_fn = make_backend(scale)
        conf.model = SHIPPED_HEAD
        wrapper = ExternalFlowWrapper(conf)
        flow_fn = wrapper.make_flow_fn()
        img = jnp.zeros((1, 64, 64, 3))
        flow, weights = flow_fn({}, img, img)
        w = np.asarray(weights)
        assert w.shape == (1, 64, 64, 1)
        assert np.all((w >= 0) & (w <= 1)) and np.isfinite(w).all()
        outs.append(w)
    # the trained head responds to the cost-volume content
    assert not np.allclose(outs[0], outs[1])


def test_fast_and_window384_configs_load():
    for name, checks in (
            ("WOFT_fast.py", lambda c: (c.flow_config.corr_impl == "local"
                                        and c.flow_config.precision == "bf16")),
            ("WOFT_window_384.py", lambda c: c.window_size == 384)):
        conf = load_config(CONFIG_DIR / name)
        assert checks(conf), name
