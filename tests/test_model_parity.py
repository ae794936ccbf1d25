"""Golden parity tests: JAX WeightedRAFT vs the torch reference (CPU).

The reference raft_core is importable without its missing weights; we
random-init the torch model (seeded), convert its state_dict with
``torch_statedict_to_params``, and assert per-module and end-to-end numeric
agreement (SURVEY.md section 7.3 parity harness).
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from conftest import add_reference_raft_path, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)
add_reference_raft_path()

from raft_core.weighted_raft import WeightedRAFT  # noqa: E402  (oracle)
from raft_core.corr import CorrBlock  # noqa: E402

from woft_tpu.models import (  # noqa: E402
    RaftConfig,
    torch_statedict_to_params,
)
from woft_tpu.models.raft import (  # noqa: E402
    encoder_apply,
    update_block_apply,
    convex_upsample,
    weight_head_apply,
    weighted_raft_forward,
)
from woft_tpu.models.corr import (  # noqa: E402
    all_pairs_correlation,
    corr_pyramid,
    corr_lookup,
)

WH_STRUCTURE = [(128, 3), (128, 3), (128, 3)]


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    args = SimpleNamespace(small=False, mixed_precision=False,
                           alternate_corr=False,
                           weight_head_structure=WH_STRUCTURE,
                           mask_estimation=False)
    net = WeightedRAFT(args)
    net.eval()
    net.requires_grad_(False)
    return net


@pytest.fixture(scope="module")
def params(torch_model):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    return torch_statedict_to_params(sd)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    im1 = rng.uniform(0, 255, (1, 128, 192, 3)).astype(np.float32)
    im2 = rng.uniform(0, 255, (1, 128, 192, 3)).astype(np.float32)
    return im1, im2


def to_torch(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def to_np(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


def test_fnet_parity(torch_model, params, images):
    im1, _ = images
    x = 2 * (im1 / 255.0) - 1.0
    theirs = to_np(torch_model.fnet(to_torch(x)))
    ours = np.asarray(encoder_apply(params["fnet"], jnp.asarray(x),
                                    "instance", False))
    assert np.allclose(ours, theirs, atol=2e-4), np.abs(ours - theirs).max()


def test_cnet_parity(torch_model, params, images):
    im1, _ = images
    x = 2 * (im1 / 255.0) - 1.0
    theirs = to_np(torch_model.cnet(to_torch(x)))
    ours = np.asarray(encoder_apply(params["cnet"], jnp.asarray(x),
                                    "batch", False))
    assert np.allclose(ours, theirs, atol=2e-4), np.abs(ours - theirs).max()


def test_corr_pyramid_and_lookup_parity(torch_model, params, images):
    rng = np.random.default_rng(1)
    B, H1, W1, D = 1, 16, 24, 256
    f1 = rng.normal(size=(B, H1, W1, D)).astype(np.float32)
    f2 = rng.normal(size=(B, H1, W1, D)).astype(np.float32)

    block = CorrBlock(to_torch(f1), to_torch(f2), num_levels=4, radius=4)
    coords = rng.uniform(-2, 26, (B, H1, W1, 2)).astype(np.float32)
    theirs = to_np(block(torch.from_numpy(
        coords.transpose(0, 3, 1, 2))))                    # (B,H1,W1,324)

    pyr = corr_pyramid(all_pairs_correlation(jnp.asarray(f1),
                                             jnp.asarray(f2)), 4)
    ours = np.asarray(corr_lookup(pyr, jnp.asarray(coords), 4))
    assert ours.shape == theirs.shape
    assert np.allclose(ours, theirs, atol=2e-4), np.abs(ours - theirs).max()


def test_update_block_parity(torch_model, params):
    rng = np.random.default_rng(2)
    B, H1, W1 = 1, 8, 12
    net = rng.normal(size=(B, H1, W1, 128)).astype(np.float32)
    inp = rng.normal(size=(B, H1, W1, 128)).astype(np.float32)
    corr = rng.normal(size=(B, H1, W1, 324)).astype(np.float32)
    flow = rng.normal(size=(B, H1, W1, 2)).astype(np.float32)

    t_net, t_mask, t_delta = torch_model.update_block(
        to_torch(net), to_torch(inp), to_torch(corr), to_torch(flow))
    o_net, o_mask, o_delta = update_block_apply(
        params["update_block"], jnp.asarray(net), jnp.asarray(inp),
        jnp.asarray(corr), jnp.asarray(flow))
    assert np.allclose(np.asarray(o_net), to_np(t_net), atol=2e-5)
    assert np.allclose(np.asarray(o_mask), to_np(t_mask), atol=2e-4)
    assert np.allclose(np.asarray(o_delta), to_np(t_delta), atol=2e-5)


def test_convex_upsample_parity(torch_model):
    rng = np.random.default_rng(3)
    B, H1, W1 = 1, 8, 12
    flow = rng.normal(size=(B, H1, W1, 2)).astype(np.float32) * 5
    mask = rng.normal(size=(B, H1, W1, 576)).astype(np.float32)
    theirs = to_np(torch_model.upsample_flow(to_torch(flow), to_torch(mask)))
    ours = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(mask)))
    assert np.allclose(ours, theirs, atol=1e-4), np.abs(ours - theirs).max()


def test_weight_head_parity(torch_model, params):
    rng = np.random.default_rng(4)
    B, H1, W1 = 1, 8, 12
    corr_chan = rng.normal(size=(B, H1, W1, 324)).astype(np.float32)
    cost_volume = rng.normal(size=(B * H1 * W1, 1, H1, W1)).astype(np.float32)

    import einops
    t_corr = einops.rearrange(
        to_torch(corr_chan),
        'B (H_patch W_patch N_levels) H1 W1 -> B H_patch W_patch N_levels H1 W1',
        H_patch=9, W_patch=9, N_levels=4)
    t_cv = einops.rearrange(torch.from_numpy(cost_volume),
                            '(B H1 W1) 1 H2 W2 -> B H1 W1 H2 W2',
                            B=B, H1=H1, W1=W1)
    theirs = to_np(torch_model.weight_head(t_corr, t_cv))

    corr_sample = jnp.asarray(corr_chan).reshape(B, H1, W1, 9, 9, 4)
    mean_resp = jnp.mean(jnp.asarray(cost_volume).reshape(B, H1, W1, -1),
                         axis=-1)
    ours = np.asarray(weight_head_apply(params["weight_head"], corr_sample,
                                        mean_resp, WH_STRUCTURE))
    assert np.allclose(ours, theirs, atol=2e-5), np.abs(ours - theirs).max()


MH_STRUCTURE = [(64, 3), (64, 3)]


def test_masked_variant_parity(images):
    """'weighted_masked' end-to-end: mask_up must match the torch oracle
    (ref:weighted_raft.py:296-310,387-422)."""
    torch.manual_seed(1)
    args = SimpleNamespace(small=False, mixed_precision=False,
                           alternate_corr=False,
                           weight_head_structure=WH_STRUCTURE,
                           mask_estimation=True,
                           mask_head_structure=MH_STRUCTURE)
    net = WeightedRAFT(args)
    net.eval()
    net.requires_grad_(False)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    p = torch_statedict_to_params(sd)

    im1, im2 = images
    iters = 2
    with torch.no_grad():
        (t_flow, t_flow_up, t_cv, t_w, t_w_up, t_mask_up) = net(
            to_torch(im1), to_torch(im2), iters=iters, test_mode=True)

    cfg = RaftConfig(
        variant="weighted_masked", iters=iters,
        weight_head_structure=tuple(tuple(s) for s in WH_STRUCTURE),
        mask_head_structure=tuple(tuple(s) for s in MH_STRUCTURE))
    out = weighted_raft_forward(p, cfg, jnp.asarray(im1), jnp.asarray(im2))

    assert "mask_up" in out
    m_err = np.abs(np.asarray(out["mask_up"]) - to_np(t_mask_up)).max()
    assert m_err < 5e-3, m_err
    w_err = np.abs(np.asarray(out["weights_up"]) - to_np(t_w_up)).max()
    assert w_err < 5e-3, w_err


def test_end_to_end_parity(torch_model, params, images):
    im1, im2 = images
    iters = 4
    with torch.no_grad():
        t_flow, t_flow_up, t_cv, t_w, t_w_up = torch_model(
            to_torch(im1), to_torch(im2), iters=iters, test_mode=True)

    cfg = RaftConfig(variant="weighted", iters=iters,
                     weight_head_structure=tuple(tuple(s) for s in WH_STRUCTURE))
    out = weighted_raft_forward(params, cfg, jnp.asarray(im1),
                                jnp.asarray(im2))

    flow_err = np.abs(np.asarray(out["flow_up"]) - to_np(t_flow_up)).max()
    w_err = np.abs(np.asarray(out["weights_up"]) - to_np(t_w_up)).max()
    assert flow_err < 5e-3, flow_err
    assert w_err < 5e-3, w_err
    # low-res flow too
    low_err = np.abs(np.asarray(out["flow"]) - to_np(t_flow)).max()
    assert low_err < 5e-4, low_err
