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


def test_onehot_zero_padding_semantics():
    """Far out-of-bounds queries must produce all-zero windows."""
    rng = np.random.default_rng(1)
    corr = jnp.asarray(rng.normal(size=(6, 16, 24)), jnp.float32)
    coords = jnp.asarray(np.full((1, 2, 3, 2), -100.0), jnp.float32)
    out = np.asarray(corr_lookup([corr], coords, 4, impl="onehot"))
    assert np.all(out == 0)
