"""Device-side image sampling and warping primitives (NHWC, jit-friendly).

These are the JAX twins of the torch/cv2 ops the reference leans on, with
matching numerics (each is parity-tested in tests/test_ops.py):

- ``grid_sample``            ~ torch ``F.grid_sample(align_corners=True,
                               padding_mode='zeros')`` wrapped in pixel
                               coordinates (ref:raft_core/utils/utils.py:59-73)
- ``warp_perspective``       ~ ``cv2.warpPerspective`` (INTER_LINEAR /
                               INTER_NEAREST, constant 0 border)
                               (ref:tracker/YAOF_tracker_single_control.py:89-95)
- ``upsample2d_align_corners`` / ``upflow8``
                             ~ ``F.interpolate(mode='bilinear',
                               align_corners=True)`` x8 flow upsampling
                               (ref:raft_core/utils/utils.py:82-84)
- ``avg_pool2d``             ~ ``F.avg_pool2d(x, 2, stride=2)`` on odd sizes
                               (ref:raft_core/corr.py:25-27)

All images are NHWC (TPU-native layout); coordinates are (x, y) pixel
coordinates with pixel centers on the integer grid.
"""

import jax
import jax.numpy as jnp


def _gather_nhwc(img, iy, ix):
    """Gather pixels: img (N,H,W,C), iy/ix (N, ...) int32 -> (N, ..., C)."""
    N = img.shape[0]
    batch_idx = jnp.arange(N).reshape((N,) + (1,) * (iy.ndim - 1))
    batch_idx = jnp.broadcast_to(batch_idx, iy.shape)
    return img[batch_idx, iy, ix]


def grid_sample(img, coords, mode="bilinear"):
    """Sample ``img`` at pixel coordinates with zero padding outside.

    Matches torch ``F.grid_sample(..., align_corners=True,
    padding_mode='zeros')`` after the pixel->[-1,1] rescale the reference's
    ``bilinear_sampler`` performs: out-of-bounds bilinear corners contribute
    exactly 0.

    Args:
        img: (N, H, W, C) float array.
        coords: (N, ..., 2) float (x, y) pixel coordinates.
        mode: 'bilinear' or 'nearest'.
    Returns:
        (N, ..., C) samples.
    """
    H, W = img.shape[1], img.shape[2]
    x = coords[..., 0]
    y = coords[..., 1]

    if mode == "nearest":
        # torch grid_sample nearest after align_corners unnormalisation:
        # round-half-away handled below in warp_perspective; here use
        # round-to-nearest-even like torch.
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        out = _gather_nhwc(img, jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1))
        return out * valid[..., None].astype(img.dtype)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(img.dtype)
    fy = (y - y0).astype(img.dtype)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    C = img.shape[-1]
    n_idx = 1
    for s in x.shape:
        n_idx *= s
    if C * 4 <= 16 and n_idx <= 400_000 and H * W <= 2_500_000:
        # (third gate: the packed source is 4 padded copies of the FULL
        # input — at 4K that is ~400 MB materialized eagerly in init
        # paths and OOMs the chip; big sources take the 4-gather path)
        # Pack the 2x2 bilinear neighbourhood into channels over a 1px zero
        # border (the border realises grid_sample's zero padding for
        # half-out corners) and fetch all four corners with ONE gather —
        # 4x fewer indices. Wins for window-sized outputs (256-512px:
        # window tracker 116 -> 128 fps at 1080p input); at full-frame
        # index counts (2M+) the 12-channel gather falls off XLA's fast
        # gather path and is ~4x SLOWER than four 3-channel gathers —
        # hence the size gate (measured r2).
        pimg = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
        packed = jnp.concatenate(
            [pimg[:, :H + 1, :W + 1], pimg[:, :H + 1, 1:],
             pimg[:, 1:, :W + 1], pimg[:, 1:, 1:]], axis=-1)
        yc = jnp.clip(y0, -1, H - 1) + 1
        xc = jnp.clip(x0, -1, W - 1) + 1
        v = _gather_nhwc(packed, yc, xc)
        okx0 = (x0 >= 0) & (x0 < W)
        okx1 = (x0 + 1 >= 0) & (x0 + 1 < W)
        oky0 = (y0 >= 0) & (y0 < H)
        oky1 = (y0 + 1 >= 0) & (y0 + 1 < H)
        w00 = (1 - fx) * (1 - fy) * (okx0 & oky0).astype(img.dtype)
        w01 = fx * (1 - fy) * (okx1 & oky0).astype(img.dtype)
        w10 = (1 - fx) * fy * (okx0 & oky1).astype(img.dtype)
        w11 = fx * fy * (okx1 & oky1).astype(img.dtype)
        return (v[..., 0 * C:1 * C] * w00[..., None]
                + v[..., 1 * C:2 * C] * w01[..., None]
                + v[..., 2 * C:3 * C] * w10[..., None]
                + v[..., 3 * C:4 * C] * w11[..., None])

    out = None
    for dy, wy in ((0, (1 - fy)), (1, fy)):
        for dx, wx in ((0, (1 - fx)), (1, fx)):
            ix = x0 + dx
            iy = y0 + dy
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            v = _gather_nhwc(img, jnp.clip(iy, 0, H - 1),
                             jnp.clip(ix, 0, W - 1))
            w = (wx * wy) * valid.astype(img.dtype)
            term = v * w[..., None]
            out = term if out is None else out + term
    return out


# alias used by the correlation lookup
bilinear_sample = grid_sample


def perspective_coords(H, out_hw):
    """Back-projected source sample coordinates of a perspective warp.

    H: (N, 3, 3) forward homography (src -> dst); returns
    (N, out_h, out_w, 2) f32 (x, y) source positions of each destination
    pixel center (the coordinates ``warp_perspective`` samples at)."""
    out_h, out_w = out_hw
    Hinv = jnp.linalg.inv(H.astype(jnp.float32))                  # (N,3,3)
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32),
                          indexing="ij")
    ones = jnp.ones_like(xs)
    dst = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)       # (HW,3)
    # coordinates must be exact fp32: never let this einsum drop to bf16
    src = jnp.einsum('nij,pj->npi', Hinv, dst,
                     precision=jax.lax.Precision.HIGHEST)         # (N,HW,3)
    z = src[..., 2:3]
    src_xy = src[..., :2] / jnp.where(jnp.abs(z) < 1e-12,
                                      jnp.where(z < 0, -1e-12, 1e-12), z)
    return src_xy.reshape(H.shape[0], out_h, out_w, 2)


def warp_perspective(img, H, out_shape=None, mode="bilinear"):
    """``cv2.warpPerspective`` twin: dst(x, y) = src(H^-1 (x, y)).

    cv2 semantics: the forward map ``H`` is inverted, destination pixel
    centers are projected into the source, bilinear with BORDER_CONSTANT=0
    (or nearest for masks). Used for the tracker pre-warp
    (ref:YAOF_tracker_single_control.py:89-95) and mask warps.

    Args:
        img: (N, H, W, C) float array.
        H: (N, 3, 3) or (3, 3) forward homography (src -> dst).
        out_shape: optional (out_h, out_w); defaults to input size.
        mode: 'bilinear' or 'nearest'.
    """
    if H.ndim == 2:
        H = H[None]
    out_h, out_w = out_shape if out_shape is not None else img.shape[1:3]
    coords = perspective_coords(H, (out_h, out_w))

    if mode == "nearest":
        # cv2 INTER_NEAREST truncates via fixed-point floor(x + 0.5)
        x = coords[..., 0]
        y = coords[..., 1]
        ix = jnp.floor(x + 0.5).astype(jnp.int32)
        iy = jnp.floor(y + 0.5).astype(jnp.int32)
        valid = (ix >= 0) & (ix < img.shape[2]) & (iy >= 0) & (iy < img.shape[1])
        out = _gather_nhwc(img, jnp.clip(iy, 0, img.shape[1] - 1),
                           jnp.clip(ix, 0, img.shape[2] - 1))
        return out * valid[..., None].astype(img.dtype)
    return grid_sample(img, coords, mode="bilinear")


def warp_axis_aligned(img, H, out_shape=None,
                      precision=jax.lax.Precision.HIGHEST):
    """``warp_perspective`` (bilinear) for AXIS-ALIGNED homographies as two
    separable one-hot matmuls — no gather anywhere.

    The caller guarantees ``H`` is scale+translate only (as produced by
    ``_bbox_to_window_h``: zero off-diagonals, unit bottom row); only
    H[0,0], H[1,1], H[0,2], H[1,2] are read. For such warps the bilinear
    weight factorizes, w(y, x, j, i) = Ry[y, j] * Rx[x, i], so the resample
    is out = Ry @ img @ Rx^T — clean MXU work instead of a 4-corner gather
    (TPU gathers are scalar-unit bound; measured r2: the 12-channel packed
    gather is the window tracker's #2 cost and balloons under vmap in the
    multi-target batch, RESULTS.md r4 xprof). Zero padding outside the
    source (cv2 BORDER_CONSTANT=0) falls out of dropping out-of-range
    one-hot columns. Bit-matches ``warp_perspective`` (tests/test_ops.py).

    Args:
        img: (N, H, W, C) float array.
        H: (N, 3, 3) or (3, 3) axis-aligned forward homography (src->dst).
        out_shape: optional (out_h, out_w); defaults to input size.
    """
    if H.ndim == 2:
        H = H[None]
    out_h, out_w = out_shape if out_shape is not None else img.shape[1:3]
    Hi, Wi = img.shape[1], img.shape[2]
    Hf = H.astype(jnp.float32)
    sx, tx = Hf[:, 0, 0], Hf[:, 0, 2]                          # (N,)
    sy, ty = Hf[:, 1, 1], Hf[:, 1, 2]

    def one_hot_resample(dst_n, src_n, s, t):
        # src coordinate of each destination pixel center: (x - t) / s,
        # matching inv([[s,0,t],[0,1,0],[0,0,1]]) in perspective_coords.
        u = (jnp.arange(dst_n, dtype=jnp.float32)[None, :] - t[:, None]) \
            / s[:, None]                                        # (N, dst)
        u0 = jnp.floor(u)
        f = (u - u0).astype(img.dtype)
        i = jnp.arange(src_n, dtype=jnp.float32)[None, None, :]  # (1,1,src)
        lo = (i == u0[:, :, None]).astype(img.dtype) * (1 - f)[:, :, None]
        hi = (i == (u0 + 1)[:, :, None]).astype(img.dtype) * f[:, :, None]
        return lo + hi                                          # (N,dst,src)

    ry = one_hot_resample(out_h, Hi, sy, ty)
    rx = one_hot_resample(out_w, Wi, sx, tx)
    tmp = jnp.einsum('nhH,nHWc->nhWc', ry, img, precision=precision)
    return jnp.einsum('nwW,nhWc->nhwc', rx, tmp, precision=precision)


def warp_perspective_fast(img, H, out_shape=None, use_pallas=None,
                          ph=48, pw=384, interpret=False,
                          precision="highest"):
    """``warp_perspective`` (bilinear, N=1) with the MXU block kernel on
    the fast path.

    The Pallas block warp (ops/pallas/warp.py) is bit-equal to the gather
    path whenever the warp's local Jacobian fits the (ph, pw) patch
    envelope (|rotation| up to ~15-18deg, x-scale up to ~1.9 at the
    defaults) — the steady-state tracking regime. The envelope is checked
    analytically per frame and a ``lax.cond`` falls back to the gather
    path outside it (large cumulative pose), so semantics are always exact.

    On non-TPU backends (or small outputs, where XLA's gather is fine)
    this is plain ``warp_perspective``.
    """
    if H.ndim == 2:
        H = H[None]
    out_h, out_w = out_shape if out_shape is not None else img.shape[1:3]
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and img.shape[0] == 1
                      and out_h * out_w >= 300_000)
    coords = perspective_coords(H, (out_h, out_w))
    if not use_pallas:
        return grid_sample(img, coords, mode="bilinear")

    from .pallas.warp import plan_block_warp_multi, warp_bilinear_from_plan

    # tiered patches: the kernel's matmul cost scales with patch area, so
    # run the smallest patch whose pose envelope holds (steady-state
    # tracking: near-identity prewarp residual) and escalate to the full
    # envelope, then to the exact gather, only on large poses. In the
    # bf16 blend mode the source is staged bf16 (exact for uint8-valued
    # frames; halves the kernel's DMA traffic).
    small, big = plan_block_warp_multi(coords[0], img.shape[1:3],
                                       tiers=((ph - 16, pw - 128),
                                              (ph, pw)))
    stage = jnp.bfloat16 if precision == "default" else None

    def fast_small(_):
        return warp_bilinear_from_plan(img, small, out_h, out_w, ph - 16,
                                       pw - 128, interpret, precision,
                                       stage_dtype=stage)

    def fast_big(_):
        return warp_bilinear_from_plan(img, big, out_h, out_w, ph, pw,
                                       interpret, precision,
                                       stage_dtype=stage)

    def slow(_):
        return grid_sample(img, coords, mode="bilinear")

    def escalate(_):
        return jax.lax.cond(big["ok"], fast_big, slow, operand=None)

    return jax.lax.cond(small["ok"], fast_small, escalate, operand=None)


def warp_validity_mask(H, src_hw, out_shape=None):
    """Analytic twin of ``cv2.warpPerspective(ones, H) > 0``.

    A warped all-ones image is positive wherever ANY bilinear corner of the
    back-projected sample lies inside the source, i.e. the source coordinate
    is in (-1, W) x (-1, H). Pure coordinate math — no image gathers
    (the tracker's pre-warp mask, ref:YAOF_tracker_single_control.py:92-95).

    Args:
        H: (3, 3) or (N, 3, 3) forward homography (src -> dst).
        src_hw: (src_h, src_w).
        out_shape: optional (out_h, out_w); defaults to src_hw.
    Returns:
        (N, out_h, out_w) bool.
    """
    if H.ndim == 2:
        H = H[None]
    src_h, src_w = src_hw
    out_h, out_w = out_shape if out_shape is not None else src_hw
    Hinv = jnp.linalg.inv(H.astype(jnp.float32))
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32),
                          indexing="ij")
    dst = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1).reshape(-1, 3)
    src = jnp.einsum('nij,pj->npi', Hinv, dst,
                     precision=jax.lax.Precision.HIGHEST)
    z = src[..., 2:3]
    sxy = src[..., :2] / jnp.where(jnp.abs(z) < 1e-12,
                                   jnp.where(z < 0, -1e-12, 1e-12), z)
    ok = ((sxy[..., 0] > -1.0) & (sxy[..., 0] < src_w)
          & (sxy[..., 1] > -1.0) & (sxy[..., 1] < src_h))
    return ok.reshape(H.shape[0], out_h, out_w)


def warp_validity_at(H, src_hw, pts):
    """``warp_validity_mask`` values at specific points — analytic, no
    gather (TPU: a 2M-point boolean gather costs ~22ms at 1080p; the same
    einsum + box check costs ~1ms and is bit-identical because the mask
    itself is defined by this formula).

    Args:
        H: (3, 3) forward homography (src -> dst).
        src_hw: (src_h, src_w).
        pts: (N, 2) float/int (x, y) destination points.
    Returns:
        (N,) bool — warp_validity_mask(H, src_hw)[y, x] at those points.
    """
    src_h, src_w = src_hw
    Hinv = jnp.linalg.inv(H.astype(jnp.float32))
    p = jnp.concatenate([pts.astype(jnp.float32),
                         jnp.ones_like(pts[:, :1], jnp.float32)], axis=-1)
    src = jnp.einsum('nij,pj->npi', Hinv[None], p,
                     precision=jax.lax.Precision.HIGHEST)[0]
    z = src[..., 2:3]
    sxy = src[..., :2] / jnp.where(jnp.abs(z) < 1e-12,
                                   jnp.where(z < 0, -1e-12, 1e-12), z)
    return ((sxy[..., 0] > -1.0) & (sxy[..., 0] < src_w)
            & (sxy[..., 1] > -1.0) & (sxy[..., 1] < src_h))


def upsample2d_align_corners(x, out_hw):
    """Bilinear resize with torch ``align_corners=True`` semantics.

    Output pixel i maps to input coordinate ``i * (in - 1) / (out - 1)``.
    (jax.image.resize uses half-pixel centers, so we sample explicitly.)

    Args:
        x: (N, H, W, C).
        out_hw: (out_h, out_w).
    """
    out_h, out_w = out_hw
    in_h, in_w = x.shape[1], x.shape[2]
    sy = (in_h - 1) / (out_h - 1) if out_h > 1 else 0.0
    sx = (in_w - 1) / (out_w - 1) if out_w > 1 else 0.0
    ys = jnp.arange(out_h, dtype=jnp.float32) * sy
    xs = jnp.arange(out_w, dtype=jnp.float32) * sx
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.broadcast_to(jnp.stack([gx, gy], axis=-1)[None],
                              (x.shape[0], out_h, out_w, 2))
    return grid_sample(x, coords, mode="bilinear")


def upflow8(flow):
    """x8 bilinear flow upsampling with value scaling
    (ref:raft_core/utils/utils.py:82-84). flow: (N, H, W, 2)."""
    out_hw = (8 * flow.shape[1], 8 * flow.shape[2])
    return 8.0 * upsample2d_align_corners(flow, out_hw)


def avg_pool2d(x, window=2, stride=2):
    """torch ``F.avg_pool2d`` twin (VALID padding, floor output size).

    x: (N, H, W, C)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID") / float(window * window)


def coords_grid(batch, ht, wd, dtype=jnp.float32):
    """(N, H, W, 2) grid of (x, y) pixel coordinates
    (ref:raft_core/utils/utils.py:76-79, channel-last)."""
    ys, xs = jnp.meshgrid(jnp.arange(ht, dtype=dtype),
                          jnp.arange(wd, dtype=dtype), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))
