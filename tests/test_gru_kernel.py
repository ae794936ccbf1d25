"""Fused SepConvGRU Pallas kernel vs the XLA path (interpret mode).

Pass criterion: the kernel must be as close to a float32 oracle as the
XLA bf16 path is — the two bf16 paths accumulate in different orders
(5 tap-split dot_generals vs one lax.conv), so their mutual difference
is bf16 round-boundary noise and is NOT a meaningful metric on its own.
On-chip A/B happens in tools/gru_ab.py (Mosaic lowering differs from
interpret mode — see RESULTS.md round-3 kernel-validation notes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from woft_tpu.models import layers
from woft_tpu.models.raft import _sep_conv_gru, precompute_gru_context
from woft_tpu.ops.pallas.gru import sep_conv_gru_pallas


def _gru_params(key, hd=128, xd=128, cd=128):
    ks = jax.random.split(key, 12)
    p = {}
    cin = hd + cd + xd
    for i, (name, kh, kw) in enumerate((("convz1", 1, 5), ("convr1", 1, 5),
                                        ("convq1", 1, 5), ("convz2", 5, 1),
                                        ("convr2", 5, 1), ("convq2", 5, 1))):
        p[name] = {
            "weight": 0.3 * jax.random.normal(ks[2 * i], (kh, kw, cin, hd),
                                              jnp.float32),
            "bias": 0.1 * jax.random.normal(ks[2 * i + 1], (hd,),
                                            jnp.float32),
        }
    return p


def _run_three_ways(p, h, x, inp):
    layers.set_precision(jax.lax.Precision("highest"), None)
    pre32 = precompute_gru_context(p, inp, 128)
    ref32 = np.asarray(_sep_conv_gru(p, h, x, pre32))

    layers.set_precision(jax.lax.Precision("default"), jnp.bfloat16)
    try:
        pre = precompute_gru_context(p, inp, 128)
        xla = np.asarray(_sep_conv_gru(p, h, x.astype(jnp.bfloat16), pre))
        ker = np.asarray(sep_conv_gru_pallas(p, h, x, pre, interpret=True))
    finally:
        layers.set_precision(jax.lax.Precision("highest"), None)
    return ref32, xla, ker


@pytest.mark.parametrize("H,W", [(16, 32), (19, 28), (8, 16)])
def test_fused_gru_matches_xla(H, W):
    p = _gru_params(jax.random.PRNGKey(0))
    kh, kx, ki = jax.random.split(jax.random.PRNGKey(1), 3)
    h = jax.random.normal(kh, (1, H, W, 128), jnp.float32)
    x = jax.random.normal(kx, (1, H, W, 128), jnp.float32)
    inp = jax.random.normal(ki, (1, H, W, 128), jnp.float32)

    ref32, xla, ker = _run_three_ways(p, h, x, inp)
    assert ker.shape == xla.shape == (1, H, W, 128)
    e_xla = np.abs(xla - ref32).mean()
    e_ker = np.abs(ker - ref32).mean()
    # the kernel is a bf16 path of the same quality as the XLA bf16 path
    assert e_ker < 1.25 * e_xla + 1e-5, (e_ker, e_xla)
    # mutual disagreement = accumulation-order noise, well under either
    # path's own bf16 error
    d_mut = np.abs(ker - xla).mean()
    assert d_mut < 0.5 * e_xla + 1e-5, (d_mut, e_xla)


def test_fused_gru_edge_zero_padding():
    """Zero-padding semantics at the image border: impulses at opposite
    corners probe every guard row/column. With integer-ish inputs the two
    bf16 paths must agree tightly (no round-boundary straddling)."""
    p = _gru_params(jax.random.PRNGKey(2))
    H, W = 8, 16
    h = jnp.zeros((1, H, W, 128), jnp.float32).at[0, 0, 0, :].set(1.0)
    x = jnp.zeros((1, H, W, 128), jnp.float32).at[0, H - 1, W - 1, :].set(
        1.0)
    inp = jnp.ones((1, H, W, 128), jnp.float32)

    ref32, xla, ker = _run_three_ways(p, h, x, inp)
    e_xla = np.abs(xla - ref32).mean()
    e_ker = np.abs(ker - ref32).mean()
    assert e_ker < 1.25 * e_xla + 1e-5, (e_ker, e_xla)


def test_forward_auto_gate_off_on_cpu():
    """gru_pallas=None must resolve to the XLA path on CPU (no Mosaic)."""
    from woft_tpu.models.raft import RaftConfig, init_raft_params, \
        weighted_raft_forward

    cfg = RaftConfig(iters=2, precision="bf16", corr_impl="onehot")
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    img = jnp.broadcast_to(
        jnp.linspace(0, 255, 64 * 48 * 3).reshape(1, 48, 64, 3),
        (1, 48, 64, 3))
    out = weighted_raft_forward(params, cfg, img, img)
    assert np.isfinite(np.asarray(out["flow_up"])).all()
    # a bf16-config forward must not leak module-wide precision into later
    # unrelated code (this broke f32 encoder parity tests downstream once)
    assert layers.get_precision() == jax.lax.Precision.HIGHEST
    assert layers.get_compute_dtype() is None
