"""Training-loss tests: the differentiable reproj loss through the QR
solve, with the tracker-matched Sobol-masked TC subsampling
(ref:pytracking/optical_flow/training_configs/v2_SNOB_large_g05.py:36-50).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from woft_tpu.models.raft import RaftConfig, init_raft_params
from woft_tpu.training.synth import synth_homography_batch
from woft_tpu.training.train import (TrainConfig, woft_loss,
                                     _random_rect_mask)

H_IMG, W_IMG = 64, 96


@pytest.fixture(scope="module")
def setup():
    cfg = RaftConfig(variant="weighted", iters=2, small=True,
                     weight_head_structure=((32, 3),))
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, H_IMG, W_IMG, 3),
                              minval=0.0, maxval=255.0)
    batch = synth_homography_batch(jax.random.PRNGKey(2), imgs,
                                   max_corner_shift=0.05)
    return cfg, params, batch


@pytest.mark.parametrize("mode", ["sobol", "grid"])
def test_loss_finite_and_differentiable(setup, mode):
    cfg, params, batch = setup
    tcfg = TrainConfig(subsample=mode, sobol_n=200, max_tc=400)
    b = dict(batch)
    if mode == "sobol":
        b["key"] = jax.random.PRNGKey(3)
    loss, grads = jax.value_and_grad(woft_loss)(params, cfg, tcfg, b)
    assert np.isfinite(float(loss))
    # gradient must reach the weight head (trained through the QR solve)
    wh = grads["weight_head"]
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(wh))
    assert gnorm > 0.0


def test_sobol_mode_matches_tracker_distribution(setup):
    """The Sobol mode must subsample only masked in-bounds points, like the
    tracker's _select_tcs; the grid mode uses everything."""
    cfg, params, batch = setup
    tcfg = TrainConfig(subsample="sobol", sobol_n=100)
    b = dict(batch)
    b["key"] = jax.random.PRNGKey(7)
    # loss should still be finite when only a small rect is valid
    loss = woft_loss(params, cfg, tcfg, b)
    assert np.isfinite(float(loss))


def test_random_rect_mask_bounds():
    for i in range(5):
        m = _random_rect_mask(jax.random.PRNGKey(i), 32, 48)
        frac = float(jnp.mean(m.astype(jnp.float32)))
        assert 0.05 < frac <= 0.85, frac


def test_train_cli_multiscale(tmp_path, monkeypatch):
    """End-to-end trainer CLI: multi-scale --size/--batch lists cycle per
    step, train + val + rolling checkpoint all run (tiny 'small' net)."""
    import cv2
    import sys
    import train_wraft

    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (80, 112, 3), dtype=np.uint8)
        cv2.imwrite(str(imgdir / f"{i}.jpg"), img)

    out = tmp_path / "ckpt"
    monkeypatch.setattr(sys, "argv", [
        "train_wraft.py", "--images", str(imgdir),
        "--size", "32x32,32x48", "--batch", "2,1",
        "--steps", "3", "--iters", "1", "--small",
        "--log-every", "1", "--val-every", "2", "--ckpt-every", "2",
        "--lr", "1e-4", "--train-flow", "--out", str(out)])
    assert train_wraft.main() == 0
    assert out.exists()
