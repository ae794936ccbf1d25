"""The one REAL shipped checkpoint (liteflownet2_v2 weight head) must load
and match a torch oracle built with the reference's structure
(ref:pytracking/optical_flow/mm.py:133-190; mm.py itself imports the absent
mmflow, so the oracle Sequential is constructed directly)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

CKPT = ("/root/reference/pytracking/weights/liteflownet2_v2/"
        "wraft_weights-ep04-end.pth")

if not os.path.exists(CKPT):
    pytest.skip("shipped liteflownet2 weights unavailable",
                allow_module_level=True)

from woft_tpu.flow.external import cost_volume_weight_head, local_cost_volume  # noqa: E402
from woft_tpu.models.convert import load_torch_checkpoint  # noqa: E402


def torch_oracle(sd, cost_volume_np, patch=7):
    """Reference WeightHead forward: (Hf*Wf, 1, 7, 7) conv stack ->
    mean-pool -> (1, 1, Hf, Wf)."""
    import torch.nn as nn
    net = nn.Sequential(
        nn.Conv2d(1, 128, 3, padding=1), nn.ReLU(),
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
        nn.Conv2d(128, 1, 1, padding=0))
    net.load_state_dict({k[len("net."):]: v for k, v in sd.items()})
    net.eval()
    B, Hf, Wf, kk = cost_volume_np.shape
    x = torch.from_numpy(
        cost_volume_np.reshape(B * Hf * Wf, patch, patch, 1)
        .transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        dense = net(x)                                 # (BHW, 1, 7, 7)
    w = dense.mean(dim=(2, 3)).numpy().reshape(B, Hf, Wf, 1)
    return w


def test_shipped_checkpoint_parity():
    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    params = load_torch_checkpoint(CKPT)

    rng = np.random.default_rng(0)
    cv = rng.normal(size=(1, 6, 9, 49)).astype(np.float32)

    ours = np.asarray(cost_volume_weight_head(params, jnp.asarray(cv)))
    theirs = torch_oracle({k: v for k, v in sd.items()}, cv)
    assert np.allclose(ours, theirs, atol=1e-5), np.abs(ours - theirs).max()


def test_local_cost_volume_layout():
    rng = np.random.default_rng(1)
    f1 = jnp.asarray(rng.normal(size=(1, 5, 7, 16)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(1, 5, 7, 16)), jnp.float32)
    cv = np.asarray(local_cost_volume(f1, f2, patch=7))
    assert cv.shape == (1, 5, 7, 49)
    # center channel (dy=3, dx=3) == plain dot product / sqrt(D)
    center = cv[0, :, :, 3 * 7 + 3]
    expect = np.einsum("hwc,hwc->hw", np.asarray(f1[0]), np.asarray(f2[0]))
    expect = expect / np.sqrt(16)
    assert np.allclose(center, expect, atol=1e-5)
