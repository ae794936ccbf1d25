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


def corr_lookup(pyramid, coords, radius=4):
    """Sample all pyramid levels around per-query centroids.

    Args:
        pyramid: list of (Q, Hl, Wl) with Q = B*H1*W1.
        coords: (B, H1, W1, 2) float (x, y) level-0 coordinates.
        radius: window radius r (canonical 4 -> 9x9 windows).
    Returns:
        (B, H1, W1, L*(2r+1)^2) feature, channel = l*(2r+1)^2 + i*(2r+1) + j
        — identical to the torch reference's channel order.
    """
    B, H1, W1, _ = coords.shape
    Q = B * H1 * W1
    flat_coords = coords.reshape(Q, 2)
    outs = []
    for lvl, corr_l in enumerate(pyramid):
        outs.append(_lookup_level(corr_l, flat_coords / (2.0 ** lvl), radius))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(B, H1, W1, -1)
