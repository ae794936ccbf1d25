"""Equivalence of the three correlation-lookup implementations.

'gather' is the semantics-defining baseline (torch-parity-tested in
test_model_parity); 'onehot' (MXU matmuls) and 'pallas' (fused kernel,
interpret mode on CPU) must match it bit-for-bit / to fp noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from woft_tpu.models.corr import (
    all_pairs_correlation,
    corr_pyramid,
    corr_lookup,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.normal(size=(1, 16, 24, 64)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(1, 16, 24, 64)), jnp.float32)
    pyr = corr_pyramid(all_pairs_correlation(f1, f2), 4)
    coords = jnp.asarray(rng.uniform(-30, 40, (1, 16, 24, 2)), jnp.float32)
    ref = np.asarray(corr_lookup(pyr, coords, 4, impl="gather"))
    return pyr, coords, ref


def test_onehot_matches_gather(setup):
    pyr, coords, ref = setup
    out = np.asarray(corr_lookup(pyr, coords, 4, impl="onehot"))
    assert np.abs(out - ref).max() < 1e-5


def test_pallas_matches_gather_interpret(setup):
    pyr, coords, ref = setup
    from woft_tpu.ops.pallas import corr_lookup as pcl
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    pcl.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        pp = pcl.pad_pyramid(pyr, 4)
        out = np.asarray(pcl.fused_corr_lookup(pp, coords, radius=4, tq=8))
    finally:
        pcl.pl.pallas_call = orig
    assert np.abs(out - ref).max() < 1e-5


def test_rowgather_matches_gather(setup):
    pyr, coords, ref = setup
    out = np.asarray(corr_lookup(pyr, coords, 4, impl="rowgather"))
    assert np.abs(out - ref).max() < 1e-5


def test_fused_pyramid_matches_pooled_volume(setup):
    """corr_pyramid_fused == all_pairs + corr_pyramid (linearity), incl.
    the pre-padded layout and the feature-space mean_response."""
    from woft_tpu.models.corr import corr_pyramid_fused

    rng = np.random.default_rng(2)
    f1 = jnp.asarray(rng.normal(size=(1, 16, 24, 64)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(1, 16, 24, 64)), jnp.float32)
    corr = all_pairs_correlation(f1, f2)
    ref_pyr = corr_pyramid(corr, 4)
    ref_mean = np.asarray(corr.reshape(1, 16, 24, -1).mean(-1))

    fused_pyr, mean_resp = corr_pyramid_fused(f1, f2, 4, pad=0)
    for a, b in zip(fused_pyr, ref_pyr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mean_resp), ref_mean,
                               atol=2e-5, rtol=1e-5)

    padded_pyr, _ = corr_pyramid_fused(f1, f2, 4, pad=5)
    for a, b in zip(padded_pyr, ref_pyr):
        a = np.asarray(a)
        np.testing.assert_allclose(a[:, 5:-5, 5:-5], np.asarray(b),
                                   atol=2e-5, rtol=1e-5)
        assert np.all(a[:, :5] == 0) and np.all(a[:, :, :5] == 0)
        assert np.all(a[:, -5:] == 0) and np.all(a[:, :, -5:] == 0)


def test_band_and_dslice_match_gather(setup):
    """Padded-pyramid impls (dslice two-stage slice, band gather+one-hot)
    must match the gather baseline, incl. zero-padding semantics."""
    from woft_tpu.models.corr import corr_lookup_band, corr_lookup_dslice
    from woft_tpu.ops.pallas.corr_lookup import _pad_amount

    pyr, coords, ref = setup
    pad = _pad_amount(4)
    padded = [jnp.pad(p, ((0, 0), (pad, pad), (pad, pad))) for p in pyr]
    out_b = np.asarray(corr_lookup_band(padded, coords, 4))
    out_d = np.asarray(corr_lookup_dslice(padded, coords, 4))
    assert np.abs(out_b - ref).max() < 1e-5
    assert np.abs(out_d - ref).max() < 1e-5


def test_local_block_volume_matches_dense_in_range():
    """Block-local recentered volume: bit-exact vs the all-pairs pyramid
    for centroids within +-margin of their query (incl. zero borders);
    saturated (finite, clamped) beyond."""
    from woft_tpu.models.corr import build_local_corr, corr_lookup_local

    rng = np.random.default_rng(5)
    H1, W1, D = 24, 32, 64
    f1 = jnp.asarray(rng.normal(size=(1, H1, W1, D)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(1, H1, W1, D)), jnp.float32)
    pyr = corr_pyramid(all_pairs_correlation(f1, f2), 4)

    ys, xs = np.meshgrid(np.arange(H1, dtype=np.float32),
                         np.arange(W1, dtype=np.float32), indexing="ij")
    grid = np.stack([xs, ys], -1)[None]
    # residuals within the exact range (margin=8 -> +-8 cells), incl.
    # pushing border queries outside the image (zero-border case)
    res = rng.uniform(-7.0, 7.0, grid.shape).astype(np.float32)
    coords = jnp.asarray(grid + res)

    ref = np.asarray(corr_lookup(pyr, coords, 4, impl="gather"))
    local = build_local_corr(f1, f2, radius=4, num_levels=4, margin=8)
    out = np.asarray(corr_lookup_local(local, coords, 4))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

    # far-out-of-range centroids: clamped (finite), not garbage
    far = jnp.asarray(grid + 500.0)
    out_far = np.asarray(corr_lookup_local(local, far, 4))
    assert np.isfinite(out_far).all()


def test_alternate_corr_matches_dense(setup):
    """On-the-fly windowed correlation (no materialized volume) must equal
    the dense-pyramid lookup, including zero padding and channel order."""
    from woft_tpu.models.corr import corr_lookup_alternate

    rng = np.random.default_rng(3)
    f1 = jnp.asarray(rng.normal(size=(2, 16, 24, 64)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(2, 16, 24, 64)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-30, 40, (2, 16, 24, 2)), jnp.float32)

    pyr = corr_pyramid(all_pairs_correlation(f1, f2), 4)
    ref = np.asarray(corr_lookup(pyr, coords, 4, impl="gather"))
    out = np.asarray(corr_lookup_alternate(f1, f2, coords, 4, 4, chunk=256))
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-5)


def test_alternate_corr_forward_matches_dense():
    """RaftConfig(alternate_corr=True) end-to-end == the dense volume path."""
    from woft_tpu.models.raft import (RaftConfig, init_raft_params,
                                      weighted_raft_forward)

    rng = np.random.default_rng(4)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)), jnp.float32)
    cfg_d = RaftConfig(variant="weighted", iters=3, corr_impl="gather")
    cfg_a = RaftConfig(variant="weighted", iters=3, alternate_corr=True,
                       alt_chunk=32)
    params = init_raft_params(jax.random.PRNGKey(0), cfg_d)
    out_d = weighted_raft_forward(params, cfg_d, img1, img2)
    out_a = weighted_raft_forward(params, cfg_a, img1, img2)
    for key in ("flow_up", "weights_up", "mean_response"):
        np.testing.assert_allclose(np.asarray(out_a[key]),
                                   np.asarray(out_d[key]),
                                   atol=1e-3, rtol=1e-4)


def test_local_pallas_construction_matches_xla():
    """The Pallas block-local construction kernel (interpret mode on CPU)
    must reproduce the XLA patch-einsum path."""
    from woft_tpu.models.corr import build_local_corr
    from woft_tpu.ops.pallas import local_corr as plc

    rng = np.random.default_rng(7)
    f1 = jnp.asarray(rng.normal(size=(1, 16, 32, 64)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(1, 16, 32, 64)), jnp.float32)

    ref = build_local_corr(f1, f2, radius=4, num_levels=4, margin=8,
                           use_pallas=False)

    orig = plc.pl.pallas_call
    plc.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        out = build_local_corr(f1, f2, radius=4, num_levels=4, margin=8,
                               use_pallas=True)
    finally:
        plc.pl.pallas_call = orig

    for a, b in zip(out.volumes, ref.volumes):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


def test_local_forward_matches_dense():
    """corr_impl='local' end-to-end == the dense path (margin covers the
    whole level at this size, so equality is exact everywhere)."""
    from woft_tpu.models.raft import (RaftConfig, init_raft_params,
                                      weighted_raft_forward)

    rng = np.random.default_rng(6)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)), jnp.float32)
    cfg_d = RaftConfig(variant="weighted", iters=3, corr_impl="gather")
    cfg_l = RaftConfig(variant="weighted", iters=3, corr_impl="local",
                       local_margin=16)
    params = init_raft_params(jax.random.PRNGKey(1), cfg_d)
    out_d = weighted_raft_forward(params, cfg_d, img1, img2)
    out_l = weighted_raft_forward(params, cfg_l, img1, img2)
    for key in ("flow_up", "weights_up", "mean_response"):
        np.testing.assert_allclose(np.asarray(out_l[key]),
                                   np.asarray(out_d[key]),
                                   atol=1e-3, rtol=1e-4)


def test_onehot_zero_padding_semantics():
    """Far out-of-bounds queries must produce all-zero windows."""
    rng = np.random.default_rng(1)
    corr = jnp.asarray(rng.normal(size=(6, 16, 24)), jnp.float32)
    coords = jnp.asarray(np.full((1, 2, 3, 2), -100.0), jnp.float32)
    out = np.asarray(corr_lookup([corr], coords, 4, impl="onehot"))
    assert np.all(out == 0)
