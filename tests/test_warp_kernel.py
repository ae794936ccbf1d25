"""Parity tests for the Pallas block-warp kernel (ops/pallas/warp.py).

Interpret-mode on the CPU mesh; the on-chip compiled A/B lives in
tools/warp_bench.py (run on real TPU, results in RESULTS.md).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from woft_tpu.ops.warp import (grid_sample, perspective_coords,
                               warp_perspective, warp_perspective_fast)
from woft_tpu.ops.pallas.warp import plan_block_warp, warp_bilinear_blocked


def _rot_h(theta, tx=0.0, ty=0.0, scale=1.0, persp=0.0):
    c, s = np.cos(theta), np.sin(theta)
    return jnp.asarray(
        np.array([[scale * c, -scale * s, tx],
                  [scale * s, scale * c, ty],
                  [persp, 0.0, 1.0]], np.float32))


@pytest.mark.parametrize("theta,tx,scale", [
    (0.0, 0.0, 1.0),
    (0.05, 12.3, 1.1),        # mild rotation + translation + zoom
    (-0.1, -40.0, 0.8),
    (0.0, 400.0, 1.0),        # large shift: much of the output is OOB
])
def test_block_warp_matches_grid_sample(theta, tx, scale):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (1, 97, 203, 3)), jnp.float32)
    H = _rot_h(theta, tx=tx, ty=7.5, scale=scale)
    coords = perspective_coords(H[None], (97, 203))[0]

    plan = plan_block_warp(coords, (97, 203))
    assert bool(plan["ok"]), "envelope unexpectedly violated"

    got = warp_bilinear_blocked(img, coords, interpret=True)
    want = grid_sample(img, coords[None], mode="bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_block_warp_perspective_term():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (1, 96, 256, 3)), jnp.float32)
    H = _rot_h(0.03, tx=5.0, persp=1e-4)
    coords = perspective_coords(H[None], (96, 256))[0]
    plan = plan_block_warp(coords, (96, 256))
    assert bool(plan["ok"])
    got = warp_bilinear_blocked(img, coords, interpret=True)
    want = grid_sample(img, coords[None], mode="bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_envelope_rejects_large_rotation():
    H = _rot_h(np.pi / 2, tx=200.0)     # 90 deg: y-extent >> patch height
    coords = perspective_coords(H[None], (96, 256))[0]
    plan = plan_block_warp(coords, (96, 256))
    assert not bool(plan["ok"])


def test_warp_perspective_fast_cond_dispatch():
    """The cond wrapper is exact on BOTH sides of the envelope."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, (1, 96, 128, 3)), jnp.float32)
    for theta in (0.05, np.pi / 2):
        H = _rot_h(theta, tx=10.0)
        got = warp_perspective_fast(img, H, use_pallas=True,
                                    interpret=True)
        want = warp_perspective(img, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-5)


def test_tiered_plans_and_mid_tier_dispatch():
    """plan_block_warp_multi: shared stats, per-tier envelopes. A ~1.35x
    zoom-out exceeds the small (32, 256) patch tier (a 128-px output
    block samples ~173 source columns + up-to-127 alignment waste) but
    fits the big (48, 384) tier; the cond wrapper must stay exact."""
    from woft_tpu.ops.pallas.warp import plan_block_warp_multi

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (1, 96, 768, 3)), jnp.float32)
    s = 1 / 1.5                        # forward src->dst scale (zoom out)
    H = jnp.asarray([[s, 0.0, 4.0], [0.0, s, 2.0], [0.0, 0.0, 1.0]],
                    jnp.float32)
    coords = perspective_coords(H[None], (96, 768))[0]
    small, big = plan_block_warp_multi(coords, (96, 768),
                                       tiers=((32, 256), (48, 384)))
    assert not bool(small["ok"])
    assert bool(big["ok"])
    got = warp_perspective_fast(img, H, use_pallas=True, interpret=True)
    want = warp_perspective(img, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_bf16_staging_uint8_frames():
    """bf16 source staging in 'default' blend mode: error vs the exact
    gather stays within the bf16-blend budget on a uint8-valued frame."""
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.integers(0, 256, (1, 96, 128, 3)),
                      jnp.float32)
    H = _rot_h(0.05, tx=6.0)
    got = warp_perspective_fast(img, H, use_pallas=True, interpret=True,
                                precision="default")
    want = warp_perspective(img, H)
    d = np.abs(np.asarray(got) - np.asarray(want))
    assert d.max() <= 1.0, d.max()     # <= one intensity step (bf16 blend)
    assert np.asarray(got).dtype == np.float32
