"""All-pairs correlation volume and pyramid lookup.

TPU-native rework of ref:raft_core/corr.py:12-100:

- ``all_pairs_correlation``: one big MXU einsum, (B,H,W,D) x2 ->
  (B*H*W, H, W) rows scaled by 1/sqrt(D).
- ``corr_pyramid``: 4-level 2x2 average-pool pyramid over each query row.
- ``corr_lookup``: bilinear sampling of a (2r+1)^2 window around per-query
  centroids at every level. Key TPU insight: the 81 sample points of a
  window share one fractional offset, so the whole window is a bilinear
  blend of FOUR integer-shifted windows — 4 gathers instead of 81x4, no
  grid_sample emulation. Falls back to zero for out-of-bounds corners,
  matching torch ``grid_sample(align_corners=True, padding_mode='zeros')``.

Channel layout matches the torch reference exactly (parity-tested):
output channel ``c = level*(2r+1)^2 + i*(2r+1) + j`` samples the volume at
``(y + (j - r), x + (i - r))`` — including RAFT's transposed-window quirk
where the first patch index offsets **x** (ref:raft_core/corr.py:37-43 via
``meshgrid(dy, dx)`` against (x, y)-ordered coords).
"""

import jax
import jax.numpy as jnp

from ..ops.warp import avg_pool2d


def all_pairs_correlation(fmap1, fmap2, precision=jax.lax.Precision.HIGHEST):
    """(B, H, W, D) x (B, H, W, D) -> (B*H*W, H2, W2) correlation rows."""
    B, H, W, D = fmap1.shape
    f1 = fmap1.reshape(B, H * W, D)
    f2 = fmap2.reshape(B, H * W, D)
    corr = jnp.einsum("bnd,bmd->bnm", f1, f2, precision=precision)
    corr = corr / jnp.sqrt(jnp.asarray(D, corr.dtype))
    return corr.reshape(B * H * W, H, W)


def corr_pyramid(corr, num_levels=4):
    """Average-pool pyramid over each query's correlation row.

    corr: (Q, H2, W2) -> list of (Q, H2/2^l, W2/2^l)."""
    pyramid = [corr]
    x = corr[..., None]                       # (Q, H2, W2, 1)
    for _ in range(num_levels - 1):
        x = avg_pool2d(x)
        pyramid.append(x[..., 0])
    return pyramid


def _lookup_level(corr_l, coords, radius):
    """Sample one pyramid level.

    corr_l: (Q, Hl, Wl); coords: (Q, 2) float (x, y) at this level's scale.
    Returns (Q, (2r+1)^2) with channel c = i*(2r+1)+j sampling
    (y + j - r, x + i - r)."""
    Q, Hl, Wl = corr_l.shape
    k = 2 * radius + 1
    x = coords[:, 0]
    y = coords[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(corr_l.dtype)[:, None, None]
    fy = (y - y0).astype(corr_l.dtype)[:, None, None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    # torch quirk: patch index i offsets x, patch index j offsets y
    di = jnp.arange(k, dtype=jnp.int32) - radius
    xi = x0[:, None, None] + di[None, :, None]        # (Q, k, 1)
    yj = y0[:, None, None] + di[None, None, :]        # (Q, 1, k)

    flat = corr_l.reshape(Q, Hl * Wl)
    out = jnp.zeros((Q, k, k), corr_l.dtype)
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            gx = xi + dx                               # (Q, k, 1)
            gy = yj + dy                               # (Q, 1, k)
            valid = ((gx >= 0) & (gx < Wl) & (gy >= 0) & (gy < Hl))
            idx = (jnp.clip(gy, 0, Hl - 1) * Wl
                   + jnp.clip(gx, 0, Wl - 1))          # (Q, k, k)
            vals = jnp.take_along_axis(flat, idx.reshape(Q, k * k), axis=1)
            w = (wx * wy) * valid.astype(corr_l.dtype)
            out = out + vals.reshape(Q, k, k) * w
    return out.reshape(Q, k * k)


def _lookup_level_onehot(corr_l, coords, radius):
    """Gather-free window sampling via one-hot matmuls (TPU fast path).

    TPU gathers run on the scalar unit and dominate the whole forward at
    large resolutions (measured 2.6 s/frame at 720p); selecting the K+1
    rows / columns of each query's window with one-hot matrices turns the
    lookup into two batched MXU matmuls with zero gathers. Out-of-range
    rows/columns produce all-zero one-hots — exactly torch grid_sample's
    zero padding. One-hot matmul is numerically exact (products are 1*v).

    corr_l: (Q, Hl, Wl); coords: (Q, 2). Returns (Q, (2r+1)^2), same
    channel order as ``_lookup_level``."""
    Q, Hl, Wl = corr_l.shape
    k = 2 * radius + 1
    x = coords[:, 0]
    y = coords[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(corr_l.dtype)[:, None, None]
    fy = (y - y0).astype(corr_l.dtype)[:, None, None]

    offs = jnp.arange(k + 1, dtype=jnp.int32) - radius          # (k+1,)
    rows = y0.astype(jnp.int32)[:, None] + offs[None]           # (Q, k+1)
    cols = x0.astype(jnp.int32)[:, None] + offs[None]           # (Q, k+1)
    oh_rows = (rows[:, :, None]
               == jnp.arange(Hl, dtype=jnp.int32)[None, None, :]
               ).astype(corr_l.dtype)                           # (Q, k+1, Hl)
    oh_cols = (cols[:, :, None]
               == jnp.arange(Wl, dtype=jnp.int32)[None, None, :]
               ).astype(corr_l.dtype)                           # (Q, k+1, Wl)

    # bf16 inputs take the fast MXU path; one-hot selection stays exact
    # either way (products are 1*v) up to the bf16 rounding of the corr
    # values themselves. f32 inputs get full-precision passes.
    f32 = jnp.float32
    prec = (jax.lax.Precision.HIGHEST if corr_l.dtype == f32
            else jax.lax.Precision.DEFAULT)
    rows_sel = jnp.einsum("qah,qhw->qaw", oh_rows, corr_l,
                          precision=prec,
                          preferred_element_type=f32).astype(corr_l.dtype)
    # produce the window directly transposed (winT[q, b, a] =
    # C[y0 + a - r, x0 + b - r]) so no relayout is needed afterwards
    win_t = jnp.einsum("qaw,qbw->qba", rows_sel, oh_cols,
                       precision=prec, preferred_element_type=f32)
    fx = fx.astype(f32)
    fy = fy.astype(f32)

    blend = ((1 - fy) * (1 - fx) * win_t[:, :k, :k]
             + (1 - fy) * fx * win_t[:, 1:, :k]
             + fy * (1 - fx) * win_t[:, :k, 1:]
             + fy * fx * win_t[:, 1:, 1:])
    # blend[q, i, j] = out[i, j] (RAFT's transposed-window quirk folded in)
    return blend.reshape(Q, k * k)


def corr_lookup_dslice(padded_pyramid, coords, radius=4):
    """Window sampling via two-stage contiguous dynamic slices.

    Uses a pre-padded pyramid (ops.pallas.corr_lookup.pad_pyramid — pad =
    window size, so clamped far-out-of-bounds starts land entirely inside
    the zero pad; no masks needed). Each query slices its (K+1, Wp) row
    band, then the (K+1, K+1) window — both contiguous, which XLA lowers to
    block gathers rather than scalar element gathers.

    padded_pyramid: list of (Q, Hp, Wp); coords: (B, H1, W1, 2).
    Returns (B, H1, W1, L*(2r+1)^2), torch channel order."""
    from ..ops.pallas.corr_lookup import _pad_amount

    B, H1, W1, _ = coords.shape
    Q = B * H1 * W1
    k = 2 * radius + 1
    pad = _pad_amount(radius)
    flat_coords = coords.reshape(Q, 2)

    outs = []
    for lvl, corr_l in enumerate(padded_pyramid):
        _, hp, wp = corr_l.shape
        c = flat_coords / (2.0 ** lvl)
        x0 = jnp.floor(c[:, 0])
        y0 = jnp.floor(c[:, 1])
        fx = (c[:, 0] - x0).astype(jnp.float32)[:, None, None]
        fy = (c[:, 1] - y0).astype(jnp.float32)[:, None, None]
        sy = jnp.clip(y0.astype(jnp.int32) - radius + pad, 0, hp - (k + 1))
        sx = jnp.clip(x0.astype(jnp.int32) - radius + pad, 0, wp - (k + 1))

        band = jax.vmap(
            lambda cq, s: jax.lax.dynamic_slice(cq, (s, 0), (k + 1, wp))
        )(corr_l, sy)                                        # (Q, k+1, Wp)
        win = jax.vmap(
            lambda bq, s: jax.lax.dynamic_slice(bq, (0, s), (k + 1, k + 1))
        )(band, sx).astype(jnp.float32)                      # (Q, k+1, k+1)

        blend = ((1 - fy) * (1 - fx) * win[:, :k, :k]
                 + (1 - fy) * fx * win[:, :k, 1:]
                 + fy * (1 - fx) * win[:, 1:, :k]
                 + fy * fx * win[:, 1:, 1:])                 # [q, j, i]
        outs.append(jnp.swapaxes(blend, 1, 2).reshape(Q, k * k))
    return jnp.concatenate(outs, axis=-1).reshape(B, H1, W1, -1)


def _lookup_level_rowgather(corr_l, coords, radius):
    """Row-contiguous gather + column one-hot matmul.

    Gathers each query's K+1 full rows with ``take_along_axis`` (contiguous
    lane-major rows — the gather TPUs handle best), then selects columns
    with the small one-hot matmul. Zero-padding semantics via row/column
    validity (out-of-range rows clamp + zero one-hot columns; fully OOB rows
    are masked)."""
    Q, Hl, Wl = corr_l.shape
    k = 2 * radius + 1
    x = coords[:, 0]
    y = coords[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)[:, None, None]
    fy = (y - y0).astype(jnp.float32)[:, None, None]

    offs = jnp.arange(k + 1, dtype=jnp.int32) - radius
    rows = y0.astype(jnp.int32)[:, None] + offs[None]           # (Q, k+1)
    row_valid = ((rows >= 0) & (rows < Hl)).astype(corr_l.dtype)
    band = jnp.take_along_axis(
        corr_l, jnp.clip(rows, 0, Hl - 1)[:, :, None], axis=1)  # (Q,k+1,Wl)
    band = band * row_valid[:, :, None]

    cols = x0.astype(jnp.int32)[:, None] + offs[None]           # (Q, k+1)
    oh_cols = (cols[:, :, None]
               == jnp.arange(Wl, dtype=jnp.int32)[None, None, :]
               ).astype(corr_l.dtype)                           # (Q,k+1,Wl)
    win_t = jnp.einsum("qaw,qbw->qba", band, oh_cols,
                       preferred_element_type=jnp.float32)      # (Q,b,a)

    blend = ((1 - fy) * (1 - fx) * win_t[:, :k, :k]
             + (1 - fy) * fx * win_t[:, 1:, :k]
             + fy * (1 - fx) * win_t[:, :k, 1:]
             + fy * fx * win_t[:, 1:, 1:])
    return blend.reshape(Q, k * k)


def corr_lookup(pyramid, coords, radius=4, impl="onehot"):
    """Sample all pyramid levels around per-query centroids.

    Args:
        pyramid: list of (Q, Hl, Wl) with Q = B*H1*W1.
        coords: (B, H1, W1, 2) float (x, y) level-0 coordinates.
        radius: window radius r (canonical 4 -> 9x9 windows).
        impl: 'onehot' (MXU matmuls, default) or 'gather'
            (take_along_axis; scalar-unit bound on TPU, fine on CPU).
    Returns:
        (B, H1, W1, L*(2r+1)^2) feature, channel = l*(2r+1)^2 + i*(2r+1) + j
        — identical to the torch reference's channel order.
    """
    B, H1, W1, _ = coords.shape
    Q = B * H1 * W1
    flat_coords = coords.reshape(Q, 2)
    level_fn = {"onehot": _lookup_level_onehot,
                "rowgather": _lookup_level_rowgather,
                "gather": _lookup_level}[impl]
    outs = []
    for lvl, corr_l in enumerate(pyramid):
        outs.append(level_fn(corr_l, flat_coords / (2.0 ** lvl), radius))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(B, H1, W1, -1)
