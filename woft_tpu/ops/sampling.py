"""Quasi-random subsampling and coordinate utilities.

The reference subsamples tentative correspondences to <=500 points with a
1-D Sobol draw scattered into a boolean mask
(ref:pytracking/configs/WOFT.py:31-53). XLA needs static shapes, so this
module re-expresses the same selection as a fixed-size gather plus validity
weights (SURVEY.md section 7.1):

- ``sobol_1d``           — exact torch ``SobolEngine(dimension=1)`` values
                           (Gray-code radical inverse), verified in tests.
- ``masked_sobol_gather`` — given a validity mask over a fixed-size point
  list, produce ``n`` gather indices into the list plus per-slot validity:
  the selected multiset equals the reference's boolean-mask selection
  (duplicate Sobol draws collapse via zeroed validity; when fewer than ``n``
  points are valid, all of them are selected).
"""

import numpy as np
import jax.numpy as jnp


def sobol_1d(n, dtype=np.float32):
    """First ``n`` points of the 1-D Sobol sequence (Gray-code order).

    Matches ``torch.quasirandom.SobolEngine(dimension=1).draw(n)`` exactly:
    x_k = sum_i bit_i(gray(k)) * 2^-(i+1), gray(k) = k ^ (k >> 1).
    """
    k = np.arange(n, dtype=np.uint64)
    gray = k ^ (k >> np.uint64(1))
    out = np.zeros(n, dtype=np.float64)
    scale = 0.5
    for _ in range(32):
        out += (gray & np.uint64(1)).astype(np.float64) * scale
        gray >>= np.uint64(1)
        scale *= 0.5
        if not gray.any():
            break
    return out.astype(dtype)


def featuremap_coords(hw, dtype=jnp.float32):
    """(2, H*W) x,y coordinate list in raster order
    (ref:pytracking/utils/misc.py:27-68)."""
    H, W = hw
    idx = jnp.arange(H * W)
    xs = (idx % W).astype(dtype)
    ys = (idx // W).astype(dtype)
    return jnp.stack([xs, ys], axis=0)


def sobol_select_mask(n_pts, to_draw=500):
    """Host-side twin of the reference subsampler's boolean mask
    (ref:configs/WOFT.py:31-53): scatter ``round(N * sobol)`` indices.

    Returns a (n_pts,) bool numpy mask. Used by tests/oracles only — the
    device pipeline uses ``masked_sobol_gather``.
    """
    if to_draw >= n_pts:
        return np.ones(n_pts, dtype=bool)
    mask = np.zeros(n_pts, dtype=bool)
    idx = np.round(n_pts * sobol_1d(to_draw)).astype(np.int64)
    mask[np.clip(idx, 0, n_pts - 1)] = True
    return mask


def masked_sobol_gather(valid, n=500):
    """Static-shape Sobol subsampling of the valid entries of a point list.

    Args:
        valid: (P,) bool/0-1 array — validity of each point slot.
        n: number of gather slots (the reference's ``to_draw``).
    Returns:
        (indices (n,) int32 into the P slots, sel_valid (n,) bool).

    Semantics (equal to the reference's boolean-mask subsampler on the
    compacted valid list):
      * ``n_valid > n``: targets = round(n_valid * sobol(n)) positions in the
        compacted list; duplicate targets are collapsed by zeroing validity.
      * ``n_valid <= n``: the first ``n_valid`` compacted positions, the rest
        of the slots are marked invalid.
    """
    valid = valid.astype(jnp.int32)
    P = valid.shape[0]
    n_valid = jnp.sum(valid)
    cs = jnp.cumsum(valid)                                    # (P,)

    sobol = jnp.asarray(sobol_1d(n))                          # (n,)
    sub_targets = jnp.round(n_valid.astype(jnp.float32) * sobol).astype(jnp.int32)
    sub_targets = jnp.sort(sub_targets)
    dup = jnp.concatenate([jnp.zeros((1,), bool),
                           sub_targets[1:] == sub_targets[:-1]])
    all_targets = jnp.arange(n, dtype=jnp.int32)

    use_sub = n_valid > n
    targets = jnp.where(use_sub, sub_targets, all_targets)
    tgt_valid = jnp.where(use_sub, ~dup, all_targets < n_valid)
    tgt_valid &= targets < n_valid

    # map compacted position k -> raster slot: first i with cumsum == k+1
    idx = jnp.searchsorted(cs, targets + 1, side="left")
    idx = jnp.clip(idx, 0, P - 1).astype(jnp.int32)
    return idx, tgt_valid
