"""End-to-end demo integration test on CPU (small synthetic clip).

Drives the actual WOFT_demo.py entry (headless) over a rendered sequence
with a known homography trajectory: exercises config loading, the host
shell, the jitted pipeline with the real (random-weight) WeightedRAFT, and
the output writers. Random weights track poorly — the assertion is that the
whole stack runs and produces finite, well-formed outputs.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from conftest import REPO_ROOT


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    import cv2
    from woft_tpu.eval.synth_eval import synth_trajectory, render_sequence

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 1.5)  # some structure
    h_gt = synth_trajectory(rng, 6, 96, 128, max_step_px=1.0)
    frames = render_sequence(base, h_gt)
    clip = tmp_path_factory.mktemp("clip")
    for i, f in enumerate(frames):
        cv2.imwrite(str(clip / f"{i:04d}.jpg"), f)
    return clip


def test_demo_headless_runs(tiny_clip, tmp_path):
    """Small config variant to keep the CPU compile fast."""
    cfg = tmp_path / "tiny_config.py"
    cfg.write_text(f"""
import sys
sys.path.insert(0, {str(REPO_ROOT)!r})
from woft_tpu.config import Config
from woft_tpu.tracker import TrackerParams, WOFTTracker


def get_config():
    conf = Config()
    conf.tracker_class = WOFTTracker
    flow = Config()
    from woft_tpu.flow.wrapper import RaftFlow
    flow.of_class = RaftFlow
    flow.raft_type = "weighted"
    flow.class_params = Config()
    flow.class_params.small = False
    flow.class_params.weight_head_structure = [(32, 3)]
    flow.iters = 2
    flow.padding_mode = "nopad"
    flow.precision = "default"
    conf.flow_config = flow
    conf.tracker_params = TrackerParams(padding_mode="nopad",
                                        subsample_n=100)
    return conf
""")
    out = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, str(Path(REPO_ROOT) / "WOFT_demo.py"),
         str(tiny_clip), "--headless", "--out", str(out),
         "--config", str(cfg), "--bbox", "30,20,60,50", "--max-frames", "4",
         "--debug"],
        capture_output=True, text=True, timeout=900,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        cwd=REPO_ROOT)
    assert proc.returncode == 0, proc.stderr[-2000:]
    hs = np.load(out / "homographies.npz")["H"]
    assert hs.shape[0] >= 3
    assert np.isfinite(hs).all()
    assert (out / "00000.jpg").exists()
    # debug overlays written headlessly (ref:YAOF:209-265 debug vis)
    import cv2
    for name in ("pw_flow", "local_flow", "composition", "template_points"):
        p = out / f"00001_debug_{name}.jpg"
        assert p.exists(), p
        im = cv2.imread(str(p))
        assert im is not None and im.size > 0 and im.std() > 0
