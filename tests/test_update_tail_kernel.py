"""Fused motion-encoder + flow-head kernels vs the XLA path (interpret).

Same pass criterion as test_gru_kernel: each bf16 path is compared to a
float32 oracle; the kernel must match the XLA bf16 path's error (their
mutual difference is accumulation-order round noise, not a metric).
On-chip compiled A/B lives in tools/update_ab.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from woft_tpu.models import layers
from woft_tpu.models.raft import _basic_motion_encoder, _flow_head
from woft_tpu.ops.pallas.update_tail import (flow_head_pallas,
                                             motion_encoder_pallas)


def _conv_p(k, kh, kw, ci, co, s=0.2):
    return {"weight": s * jax.random.normal(k, (kh, kw, ci, co),
                                            jnp.float32),
            "bias": 0.1 * jax.random.normal(jax.random.fold_in(k, 1),
                                            (co,), jnp.float32)}


def _me_params(key):
    ks = jax.random.split(key, 5)
    return {"convc1": _conv_p(ks[0], 1, 1, 324, 256),
            "convc2": _conv_p(ks[1], 3, 3, 256, 192),
            "convf1": _conv_p(ks[2], 7, 7, 2, 128),
            "convf2": _conv_p(ks[3], 3, 3, 128, 64),
            "conv": _conv_p(ks[4], 3, 3, 256, 126)}


def _fh_params(key):
    ks = jax.random.split(key, 2)
    return {"conv1": _conv_p(ks[0], 3, 3, 128, 256),
            "conv2": _conv_p(ks[1], 3, 3, 256, 2)}


@pytest.mark.parametrize("H,W,tile", [(16, 32, 8), (19, 40, 8),
                                      (24, 36, 16)])
def test_motion_encoder_kernel_matches_xla(H, W, tile):
    p = _me_params(jax.random.PRNGKey(0))
    kc, kf = jax.random.split(jax.random.PRNGKey(1))
    corr = jax.random.normal(kc, (1, H, W, 324), jnp.float32)
    flow = 3.0 * jax.random.normal(kf, (1, H, W, 2), jnp.float32)

    layers.set_precision(jax.lax.Precision("highest"), None)
    ref = np.asarray(_basic_motion_encoder(p, flow, corr))
    try:
        layers.set_precision(jax.lax.Precision("default"), jnp.bfloat16)
        xla = np.asarray(_basic_motion_encoder(p, flow, corr)
                         ).astype(np.float32)
        cor1 = layers.relu(layers.conv2d(p["convc1"], corr,
                                         out_dtype=jnp.bfloat16))
        flo1 = layers.relu(layers.conv2d(p["convf1"], flow, padding=3,
                                         out_dtype=jnp.bfloat16))
        ker = np.asarray(motion_encoder_pallas(p, flow, cor1, flo1,
                                               tile=tile, interpret=True)
                         ).astype(np.float32)
    finally:
        layers.set_precision(jax.lax.Precision("highest"), None)

    assert ker.shape == xla.shape == (1, H, W, 128)
    e_xla = np.abs(xla - ref).mean()
    e_ker = np.abs(ker - ref).mean()
    assert e_ker < 1.25 * e_xla + 1e-5, (e_ker, e_xla)
    d_mut = np.abs(ker - xla).mean()
    assert d_mut < 0.5 * e_xla + 1e-5, (d_mut, e_xla)
    # the raw-flow channels pass through exactly (cat semantics)
    np.testing.assert_array_equal(
        ker[..., 126:], np.asarray(flow.astype(jnp.bfloat16)
                                   ).astype(np.float32))


def test_motion_encoder_border_zero_padding():
    """Corner impulses probe the stage-1 border masking: the second conv
    must see ZERO (the XLA path's conv padding) at image borders, not the
    relu(bias) halo values the kernel computes there."""
    p = _me_params(jax.random.PRNGKey(2))
    H, W = 16, 32
    corr = jnp.zeros((1, H, W, 324), jnp.float32)
    corr = corr.at[0, 0, 0].set(1.0).at[0, H - 1, W - 1].set(-1.0)
    flow = jnp.zeros((1, H, W, 2), jnp.float32
                     ).at[0, 0, W - 1, 0].set(2.0)

    layers.set_precision(jax.lax.Precision("highest"), None)
    ref = np.asarray(_basic_motion_encoder(p, flow, corr))
    try:
        layers.set_precision(jax.lax.Precision("default"), jnp.bfloat16)
        xla = np.asarray(_basic_motion_encoder(p, flow, corr)
                         ).astype(np.float32)
        cor1 = layers.relu(layers.conv2d(p["convc1"], corr,
                                         out_dtype=jnp.bfloat16))
        flo1 = layers.relu(layers.conv2d(p["convf1"], flow, padding=3,
                                         out_dtype=jnp.bfloat16))
        ker = np.asarray(motion_encoder_pallas(p, flow, cor1, flo1,
                                               tile=8, interpret=True)
                         ).astype(np.float32)
    finally:
        layers.set_precision(jax.lax.Precision("highest"), None)
    e_xla = np.abs(xla - ref).mean()
    e_ker = np.abs(ker - ref).mean()
    assert e_ker < 1.25 * e_xla + 1e-5, (e_ker, e_xla)


@pytest.mark.parametrize("H,W,tile", [(16, 32, 8), (19, 40, 16)])
def test_flow_head_kernel_matches_xla(H, W, tile):
    p = _fh_params(jax.random.PRNGKey(3))
    net = jax.random.normal(jax.random.PRNGKey(4), (1, H, W, 128),
                            jnp.float32)

    layers.set_precision(jax.lax.Precision("highest"), None)
    ref = np.asarray(_flow_head(p, net))
    try:
        layers.set_precision(jax.lax.Precision("default"), jnp.bfloat16)
        xla = np.asarray(_flow_head(p, net.astype(jnp.bfloat16)))
        ker = np.asarray(flow_head_pallas(p, net, tile=tile,
                                          interpret=True))
    finally:
        layers.set_precision(jax.lax.Precision("highest"), None)

    assert ker.shape == xla.shape == (1, H, W, 2)
    assert ker.dtype == np.float32          # delta flow is never rounded
    e_xla = np.abs(xla - ref).mean()
    e_ker = np.abs(ker - ref).mean()
    assert e_ker < 1.25 * e_xla + 1e-5, (e_ker, e_xla)
    d_mut = np.abs(ker - xla).mean()
    assert d_mut < 0.5 * e_xla + 1e-5, (d_mut, e_xla)


def test_forward_tail_auto_gate_off_on_cpu():
    """tail_pallas=None must resolve to the XLA path on CPU, and the
    forward must not leak precision state."""
    from woft_tpu.models.raft import RaftConfig, init_raft_params, \
        weighted_raft_forward

    cfg = RaftConfig(iters=2, precision="bf16", corr_impl="onehot")
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    img = jnp.broadcast_to(
        jnp.linspace(0, 255, 64 * 48 * 3).reshape(1, 48, 64, 3),
        (1, 48, 64, 3))
    out = weighted_raft_forward(params, cfg, img, img)
    assert np.isfinite(np.asarray(out["flow_up"])).all()
    assert layers.get_precision() == jax.lax.Precision.HIGHEST
    assert layers.get_compute_dtype() is None
