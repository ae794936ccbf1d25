"""Evaluation harness tests (oracle tracker -> zero error)."""

import numpy as np
import pytest

from woft_tpu.eval.metrics import alignment_error, corner_errors, success_rates
from woft_tpu.eval.synth_eval import (evaluate_tracker_synthetic,
                                      synth_trajectory, render_sequence)


class OracleTracker:
    """Returns the exact GT H (captured from the rendered trajectory)."""

    def __init__(self):
        self.i = 0
        self.h_gt = None

    def init(self, img, mask):
        self.i = 0

    def track(self, frame):
        self.i += 1
        return self.h_gt[self.i], None


class ConstantTracker:
    def init(self, img, mask):
        pass

    def track(self, frame):
        return np.eye(3), None


def test_metrics_zero_for_exact():
    rng = np.random.default_rng(0)
    h = synth_trajectory(rng, 10, 96, 128)
    corners = np.array([[10, 10], [100, 10], [100, 80], [10, 80]], float).T
    errs = corner_errors(h, h, corners)
    assert np.allclose(errs, 0, atol=1e-9)
    m = alignment_error(h, h, corners)
    assert m["median_px"] == 0
    s = success_rates(h, h, corners)
    assert s["p@2px"] == 1.0


def test_oracle_tracker_scores_zero():
    pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 255, (64, 96, 3)).astype(np.uint8)
    mask = np.zeros((64, 96), np.uint8)
    mask[16:48, 24:72] = 255

    tracker = OracleTracker()
    # pre-render so the oracle knows the trajectory the harness will build
    h_gt = synth_trajectory(np.random.default_rng(7), 8, 64, 96)
    tracker.h_gt = h_gt
    metrics, h_pred, h_gt_out = evaluate_tracker_synthetic(
        tracker, base, mask, n_frames=8, seed=7)
    assert np.allclose(h_gt_out, h_gt)
    assert metrics["median_px"] < 1e-6
    assert metrics["p@2px"] == 1.0


def test_static_tracker_accumulates_error():
    pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    base = rng.uniform(0, 255, (64, 96, 3)).astype(np.uint8)
    mask = np.zeros((64, 96), np.uint8)
    mask[16:48, 24:72] = 255
    metrics, _, _ = evaluate_tracker_synthetic(
        ConstantTracker(), base, mask, n_frames=10, seed=3, max_step_px=5.0)
    assert metrics["mean_px"] > 1.0


def test_stress_trajectory_has_jumps():
    """jump_every injects large per-frame motion (redetection stressor)
    while the default walk stays smooth."""
    rng = np.random.default_rng(0)
    smooth = synth_trajectory(rng, 30, 96, 128, max_step_px=4.0)
    rng = np.random.default_rng(0)
    jumpy = synth_trajectory(rng, 30, 96, 128, max_step_px=4.0,
                             jump_every=10, jump_px=40.0)

    def step_mags(hs):
        c = np.array([[64.0], [48.0]])
        from woft_tpu.geometry import np_h_proj
        return np.array([
            np.linalg.norm(np_h_proj(np.linalg.inv(hs[t + 1]) @ hs[t], c)
                           - c)
            for t in range(len(hs) - 1)])

    ms, mj = step_mags(smooth), step_mags(jumpy)
    assert ms.max() < 15.0
    assert mj.max() > 30.0          # the jolt is visible
    assert (mj > 30.0).sum() <= 4   # but rare


def test_flow_to_image_matches_reference_wheel():
    """Exact Baker-wheel parity with the reference flow_viz."""
    import sys
    sys.path.insert(0, "/root/reference/pytracking/external/RAFT/raft_core"
                       "/utils")
    try:
        import flow_viz
    except ImportError:
        pytest.skip("reference flow_viz not importable")
    from woft_tpu.utils.vis import flow_to_image

    rng = np.random.default_rng(0)
    flow = rng.normal(0, 5, (32, 48, 2)).astype(np.float32)
    ref = flow_viz.flow_to_image(flow, convert_to_bgr=True)
    out = flow_to_image(flow, convert_to_bgr=True)
    assert np.array_equal(out, ref)
    ref_c = flow_viz.flow_to_image(flow, clip_flow=3.0)
    out_c = flow_to_image(flow, clip_flow=3.0)
    assert np.array_equal(out_c, ref_c)


def test_vis_prims_round3():
    """draw_corners / vis_vector_in_center / vis_flow / plt bridge /
    compatible_contours / FlowGUI headless probe (ref vis_utils
    372-400, 702-828, 668-696, 624-665, 965-1033)."""
    import numpy as np
    import cv2
    from woft_tpu.utils import vis

    img = np.full((60, 80, 3), 120, np.uint8)
    corners = np.array([[10.5, 60.2, 60.0, 10.0],
                        [10.0, 12.0, 50.5, 48.0]])
    out = vis.draw_corners(img, corners, (0, 255, 0), with_tl=True)
    assert out.shape == img.shape and out.sum() != img.sum()

    out = vis.vis_vector_in_center(img, (12.3, -4.5))
    assert out.sum() != img.sum()

    flow = np.zeros((60, 80, 2), np.float32)
    flow[..., 0] = 3.0
    occl = np.zeros((60, 80), np.uint8)
    occl[:, 40:] = 255
    sv, dv = vis.vis_flow(flow, img, img, grid_sz=20, occl=occl,
                          point_radius=2)
    assert sv.shape == img.shape and dv.shape == img.shape
    sv2, _ = vis.vis_flow(flow, img, img, grid_sz=20,
                          arrow_color="rand")
    assert sv2.sum() != img.sum()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(2, 2))
    ax.plot([0, 1], [1, 0])
    bgr = vis.plt_to_img(fig)
    assert bgr.ndim == 3 and bgr.shape[2] == 3
    fig2, ax2 = plt.subplots(figsize=(2, 2))
    ax2.plot([0, 1], [0, 1])
    assert vis.cv_plt_show(fig2) is not None     # headless: returns image

    mask = np.zeros((40, 40), np.uint8)
    mask[10:30, 10:30] = 255
    cs = vis.compatible_contours(mask)
    assert len(cs) == 1

    gui = vis.FlowGUI(img, img, flow, mask=np.ones((60, 80)))
    (rx, ry), visible = gui.probe(20.0, 20.0)
    assert abs(rx - 23.0) < 1e-4 and abs(ry - 20.0) < 1e-4 and visible
    lv, rv = gui.render(click=(20, 20), with_flow=True)
    assert lv.shape == img.shape


def test_cpu_unpickler_round3():
    import io as _io
    import pickle
    import numpy as np
    from woft_tpu.utils.io import CPU_Unpickler

    blob = pickle.dumps({"a": np.arange(3)})
    out = CPU_Unpickler(_io.BytesIO(blob)).load()
    assert list(out["a"]) == [0, 1, 2]

    import torch
    t = torch.arange(4, dtype=torch.float32)
    blob = pickle.dumps({"t": t})
    out = CPU_Unpickler(_io.BytesIO(blob)).load()
    assert out["t"].device.type == "cpu"
    assert torch.equal(out["t"], t)
