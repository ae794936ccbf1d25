"""Synthetic-sequence tracker evaluation.

Generates a video by warping one base frame along a smooth random
homography trajectory (known ground truth per frame), runs a tracker over
it, and reports alignment metrics. This is the framework's self-contained
accuracy harness: it needs no external benchmark data and exercises the
full pipeline (pre-warp, flow, fit, fallback ladder) with exact GT.
"""

import numpy as np

from ..geometry.homography import np_compose_h
from .metrics import alignment_error, success_rates


def synth_trajectory(rng, n_frames, height, width, *, max_step_px=4.0,
                     max_rot=0.004, max_scale=0.003, max_persp=2e-6,
                     jump_every=0, jump_px=0.0):
    """Smooth random homography walk.

    ``jump_every > 0`` injects a large translation jolt every that many
    frames (breaking trajectory smoothness) — the stress mode that trips
    the inlier check and exercises the redetection/fallback ladder
    end-to-end with a real network.

    Returns (T, 3, 3) H_cur2init: frame t pixels -> frame 0 pixels."""
    hs = [np.eye(3)]
    step = np.eye(3)
    for t in range(n_frames - 1):
        jitter = np.eye(3)
        ang = rng.uniform(-max_rot, max_rot)
        scale = 1.0 + rng.uniform(-max_scale, max_scale)
        c, s = np.cos(ang), np.sin(ang)
        jitter[:2, :2] = scale * np.array([[c, -s], [s, c]])
        jitter[0, 2] = rng.uniform(-max_step_px, max_step_px)
        jitter[1, 2] = rng.uniform(-max_step_px, max_step_px)
        jitter[2, 0] = rng.uniform(-max_persp, max_persp)
        jitter[2, 1] = rng.uniform(-max_persp, max_persp)
        # smooth: blend the per-frame step towards the new jitter
        step = 0.8 * step + 0.2 * jitter
        step /= step[2, 2]
        inst = step
        if jump_every and (t + 1) % jump_every == 0:
            jolt = np.eye(3)
            jolt[0, 2] = rng.choice([-1, 1]) * jump_px
            jolt[1, 2] = rng.choice([-1, 1]) * jump_px * 0.5
            inst = jolt @ step
        hs.append(np_compose_h(np.linalg.inv(inst), hs[-1]))
    return np.stack(hs)


def render_sequence(base_frame, h_cur2init):
    """Render frames: frame_t(x) = base(H_cur2init_t(x)) via cv2 warp."""
    import cv2
    T = h_cur2init.shape[0]
    H, W = base_frame.shape[:2]
    frames = []
    for t in range(T):
        frames.append(cv2.warpPerspective(
            base_frame, np.linalg.inv(h_cur2init[t]), (W, H),
            flags=cv2.INTER_LINEAR))
    return frames


def evaluate_tracker_synthetic(tracker, base_frame, mask, *, n_frames=30,
                               seed=0, noise=0.0, **traj_kwargs):
    """Track a synthetic sequence; return metrics + per-frame errors.

    tracker: object with the reference init/track API (e.g. WOFTTracker).
    base_frame: (H, W, 3) uint8 BGR; mask: (H, W) uint8.
    """
    rng = np.random.default_rng(seed)
    H, W = base_frame.shape[:2]
    h_gt = synth_trajectory(rng, n_frames, H, W, **traj_kwargs)
    frames = render_sequence(base_frame, h_gt)
    if noise:
        frames = [np.clip(f + rng.normal(0, noise, f.shape), 0,
                          255).astype(f.dtype) for f in frames]

    tracker.init(frames[0], mask)
    h_pred = [np.eye(3)]
    for frame in frames[1:]:
        h, _ = tracker.track(frame)
        h_pred.append(h)
    h_pred = np.stack(h_pred)

    from ..geometry.bbox import Bbox
    box = Bbox.from_mask(mask > 0)
    corners = np.asarray(box.as_points(), float).T       # (2, 4)

    metrics = alignment_error(h_pred, h_gt, corners)
    metrics.update(success_rates(h_pred, h_gt, corners))
    return metrics, h_pred, h_gt
