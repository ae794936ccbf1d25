"""Parity tests for device ops vs torch / cv2 oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from woft_tpu.ops import (  # noqa: E402
    grid_sample,
    warp_perspective,
    warp_axis_aligned,
    upflow8,
    upsample2d_align_corners,
    avg_pool2d,
    coords_grid,
    sobol_1d,
    sobol_select_mask,
    masked_sobol_gather,
    make_padder,
)


def torch_grid_sample_pixel(img_nchw, coords_xy, mode="bilinear"):
    """The reference's bilinear_sampler (ref:raft_core/utils/utils.py:59-73)."""
    H, W = img_nchw.shape[-2:]
    xgrid = 2 * coords_xy[..., 0:1] / (W - 1) - 1
    ygrid = 2 * coords_xy[..., 1:2] / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img_nchw, grid, align_corners=True)


def test_grid_sample_bilinear_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 13, 17, 3)).astype(np.float32)
    coords = rng.uniform(-3, 20, (2, 9, 11, 2)).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    theirs = torch_grid_sample_pixel(
        torch.from_numpy(img.transpose(0, 3, 1, 2)),
        torch.from_numpy(coords)).numpy().transpose(0, 2, 3, 1)
    assert np.allclose(ours, theirs, atol=1e-5), np.abs(ours - theirs).max()


def test_grid_sample_oob_zero():
    img = np.ones((1, 4, 4, 1), np.float32)
    coords = np.array([[[[-2.0, -2.0], [10.0, 1.0], [1.5, 1.5],
                         [-0.5, 0.0]]]], np.float32)
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))[0, 0, :, 0]
    assert out[0] == 0.0
    assert out[1] == 0.0
    assert out[2] == 1.0
    assert np.isclose(out[3], 0.5)  # half in-bounds blend with zero border


def test_warp_perspective_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (37, 53, 3)).astype(np.float32)
    H = np.array([[0.98, 0.02, 3.0],
                  [-0.03, 1.01, -2.0],
                  [1e-4, -5e-5, 1.0]])
    ref = cv2.warpPerspective(img, H, (53, 37), flags=cv2.INTER_LINEAR)
    ours = np.asarray(warp_perspective(jnp.asarray(img[None]),
                                       jnp.asarray(H.astype(np.float32))))[0]
    # cv2 uses fixed-point (5 fractional bits) interpolation -> small quantisation
    # differences; interior agreement should be ~1/32 of the value range.
    diff = np.abs(ref - ours)
    assert np.median(diff) < 0.5
    assert np.mean(diff < 4.0) > 0.99, (np.mean(diff), diff.max())


def test_warp_perspective_nearest_mask():
    cv2 = pytest.importorskip("cv2")
    mask = np.zeros((40, 50), np.float32)
    mask[10:30, 15:35] = 1.0
    H = np.array([[1.0, 0.05, 5.0], [0.02, 0.97, -3.0], [0, 0, 1.0]])
    ref = cv2.warpPerspective(mask, H, (50, 40), flags=cv2.INTER_NEAREST)
    ours = np.asarray(warp_perspective(jnp.asarray(mask[None, :, :, None]),
                                       jnp.asarray(H.astype(np.float32)),
                                       mode="nearest"))[0, :, :, 0]
    agree = np.mean((ref > 0) == (ours > 0))
    assert agree > 0.995, agree


def test_warp_axis_aligned_matches_gather():
    """The separable one-hot matmul resample must reproduce
    warp_perspective for scale+translate homographies, including crops
    that spill past the frame (zero border) and under vmap (the
    multi-target batch)."""
    import jax
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (1, 37, 53, 3)).astype(np.float32)
    cases = [
        (1.7, 2.3, -4.2, 3.1),         # downscale-ish crop, interior
        (0.31, 0.45, 10.0, -20.0),     # upscale, spills top/bottom
        (5.0, 5.0, -120.0, -90.0),     # window mostly off-frame
        (1.0, 1.0, 0.0, 0.0),          # identity (integer coords)
    ]
    for sx, sy, tx, ty in cases:
        H = np.array([[sx, 0, tx], [0, sy, ty], [0, 0, 1]], np.float32)
        ref = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(H),
                                          out_shape=(24, 32)))
        ours = np.asarray(warp_axis_aligned(jnp.asarray(img),
                                            jnp.asarray(H),
                                            out_shape=(24, 32)))
        assert np.allclose(ours, ref, atol=2e-3), (
            (sx, sy, tx, ty), np.abs(ours - ref).max())

    # batched/vmapped: per-sample homographies
    imgs = rng.uniform(0, 255, (4, 37, 53, 3)).astype(np.float32)
    Hs = np.stack([np.array([[1 + 0.2 * i, 0, 2.0 * i - 3],
                             [0, 1.3 - 0.1 * i, -1.5 * i],
                             [0, 0, 1]], np.float32) for i in range(4)])
    ref = np.asarray(warp_perspective(jnp.asarray(imgs), jnp.asarray(Hs),
                                      out_shape=(16, 24)))
    ours = np.asarray(warp_axis_aligned(jnp.asarray(imgs), jnp.asarray(Hs),
                                        out_shape=(16, 24)))
    assert np.allclose(ours, ref, atol=2e-3), np.abs(ours - ref).max()
    vm = np.asarray(jax.vmap(
        lambda im, h: warp_axis_aligned(im[None], h, out_shape=(16, 24))[0]
    )(jnp.asarray(imgs), jnp.asarray(Hs)))
    assert np.allclose(vm, ref, atol=2e-3), np.abs(vm - ref).max()


def test_upflow8_matches_torch():
    rng = np.random.default_rng(2)
    flow = rng.normal(size=(1, 6, 8, 2)).astype(np.float32)
    theirs = (8 * F.interpolate(torch.from_numpy(flow.transpose(0, 3, 1, 2)),
                                size=(48, 64), mode="bilinear",
                                align_corners=True)).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(upflow8(jnp.asarray(flow)))
    assert np.allclose(ours, theirs, atol=1e-4), np.abs(ours - theirs).max()


def test_upsample_align_corners_generic():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    theirs = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           size=(11, 20), mode="bilinear",
                           align_corners=True).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(upsample2d_align_corners(jnp.asarray(x), (11, 20)))
    assert np.allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("hw", [(8, 8), (9, 11), (45, 80), (11, 20)])
def test_avg_pool2d_matches_torch(hw):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, *hw, 3)).astype(np.float32)
    theirs = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          2, stride=2).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(avg_pool2d(jnp.asarray(x)))
    assert ours.shape == theirs.shape
    assert np.allclose(ours, theirs, atol=1e-6)


def test_coords_grid_matches_reference_layout():
    g = np.asarray(coords_grid(1, 3, 4))
    assert g.shape == (1, 3, 4, 2)
    assert g[0, 2, 3, 0] == 3  # x
    assert g[0, 2, 3, 1] == 2  # y


def test_sobol_matches_torch():
    eng = torch.quasirandom.SobolEngine(dimension=1)
    theirs = eng.draw(500).numpy().flatten()
    ours = sobol_1d(500)
    assert np.array_equal(ours, theirs)


def test_sobol_select_mask_matches_reference_subsampler():
    """Oracle: the reference subsampler's mask (ref:configs/WOFT.py:31-53)."""
    for n_pts in [501, 1000, 14400, 9999]:
        mask = np.zeros(n_pts) > 0
        eng = torch.quasirandom.SobolEngine(dimension=1)
        indices = eng.draw(500).numpy().flatten()
        indices = np.round(n_pts * indices).astype(np.int32)
        mask[indices] = True
        ours = sobol_select_mask(n_pts, 500)
        assert np.array_equal(ours, mask), n_pts


def test_masked_sobol_gather_equals_mask_semantics():
    rng = np.random.default_rng(5)
    for n_valid, P in [(2000, 4000), (499, 4000), (500, 600), (505, 600)]:
        valid = np.zeros(P, bool)
        valid[rng.choice(P, n_valid, replace=False)] = True
        idx, sel_valid = masked_sobol_gather(jnp.asarray(valid), 500)
        idx = np.asarray(idx)
        sel_valid = np.asarray(sel_valid)

        # oracle: compact the valid slots, apply the reference mask
        compacted = np.where(valid)[0]
        ref_mask = sobol_select_mask(n_valid, 500)
        ref_selected = set(compacted[ref_mask].tolist())

        got_selected = set(idx[sel_valid].tolist())
        assert got_selected == ref_selected, (n_valid, P)
        # every selected slot must be valid, no duplicates among valid slots
        assert valid[idx[sel_valid]].all()
        assert len(got_selected) == sel_valid.sum()


@pytest.mark.parametrize("mode,hw", [("nopad", (48, 64)), ("crop", (50, 67)),
                                     ("RAFT", (37, 53)), ("Michal", (37, 53))])
def test_padders_shapes(mode, hw):
    x = jnp.zeros((1, *hw, 3))
    padder = make_padder(mode, x.shape)
    (p1, p2) = padder.pad(x, x)
    assert p1.shape[1] % 8 == 0 and p1.shape[2] % 8 == 0
    flow = jnp.zeros((1, p1.shape[1], p1.shape[2], 2))
    un = padder.unpad(flow)
    if mode == "crop":
        assert un.shape == flow.shape
    elif mode == "nopad":
        assert un.shape == flow.shape
    else:
        assert un.shape[1:3] == (hw[0], hw[1])


def test_replicate_padder_matches_torch_inputpadder():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 37, 53, 3)).astype(np.float32)
    ht, wd = 37, 53
    pad_ht = (((ht // 8) + 1) * 8 - ht) % 8
    pad_wd = (((wd // 8) + 1) * 8 - wd) % 8
    pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
    theirs = F.pad(torch.from_numpy(x.transpose(0, 3, 1, 2)), pad,
                   mode="replicate").numpy().transpose(0, 2, 3, 1)
    padder = make_padder("RAFT", x.shape)
    ours = np.asarray(padder.pad(jnp.asarray(x))[0])
    assert np.array_equal(ours, theirs)
    # unpad inverts
    back = np.asarray(padder.unpad(jnp.asarray(theirs)))
    assert np.array_equal(back, x)
