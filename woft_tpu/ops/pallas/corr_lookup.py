"""Fused correlation-pyramid lookup as a Pallas TPU kernel.

The TPU-native equivalent of the reference's CUDA correlation sampler
(ref:pytracking/external/RAFT/alt_cuda_corr/correlation_kernel.cu:19-119) —
rethought for the memory system instead of translated. The XLA paths
(gather: scalar-unit bound; one-hot matmul: burns padded MXU passes) leave
4-10x on the table; this kernel streams each query's padded correlation
rows through VMEM once per lookup and slices the four bilinear corner
windows directly:

- the pyramid is zero-padded once per frame pair by ``pad_pyramid`` with
  pad = window size, so every window slice — including fully out-of-bounds
  queries, whose clamped start lands entirely inside the zero pad — needs
  no masking and reproduces grid_sample's zero padding exactly,
- clamped int32 window starts are scalar-prefetched to SMEM; fractional
  bilinear weights ride along as a VMEM block,
- Mosaic requires dynamic sublane offsets to be provably 8-aligned and
  rejects dynamic lane rolls outright (both found on-chip; interpret mode
  accepts either), so the kernel loads an 8-aligned 24-row band and
  extracts BOTH the row window and the column window with exact one-hot
  select matmuls — each output element sums exactly one nonzero product,
  so the contraction is bit-exact and rides the MXU; all levels are
  processed in one kernel,
- the kernel emits (Q, levels, K, K) in (j, i) window order; the caller
  transposes to RAFT's (i, j) channel quirk with one cheap XLA relayout.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_amount(radius):
    # window slice is (K+1) = 2r+2 wide; pad by that much so fully
    # out-of-bounds windows land entirely inside the zero pad after clamping
    return 2 * radius + 2


def pad_pyramid(pyramid, radius=4, dtype=None):
    """Zero-pad each level for the kernel: (Q, Hl, Wl) -> (Q, Hp, Wp).

    Besides the symmetric window pad, the trailing dims are rounded up to
    Mosaic-native tiles (sublane x8, lane x128), plus a 24-row tail so the
    kernel's 8-aligned 24-row band load stays in bounds for any clamped
    window start (reads land in zeros, which is exactly grid_sample's
    zero-padding semantics)."""
    pad = _pad_amount(radius)
    out = []
    for corr in pyramid:
        if dtype is not None:
            corr = corr.astype(dtype)
        _, h, w = corr.shape
        hp = h + 2 * pad
        wp = w + 2 * pad
        extra_h = 24 + (-hp) % 8
        extra_w = (-wp) % 128
        out.append(jnp.pad(corr, ((0, 0), (pad, pad + extra_h),
                                  (pad, pad + extra_w))))
    return out


def _starts_and_fracs(shapes, coords, radius):
    """Clamped window starts (padded coords, int32) + bilinear fractions.

    Returns (starts (Q, L*2) int32 [sy, sx] per level,
             fracs (Q, L*2) f32 [fy, fx] per level)."""
    pad = _pad_amount(radius)
    k1 = 2 * radius + 2
    starts = []
    fracs = []
    for lvl, (_, hp, wp) in enumerate(shapes):
        c = coords / (2.0 ** lvl)
        x0 = jnp.floor(c[:, 0])
        y0 = jnp.floor(c[:, 1])
        fx = (c[:, 0] - x0).astype(jnp.float32)
        fy = (c[:, 1] - y0).astype(jnp.float32)
        # row clamp leaves room for the kernel's 8-aligned 24-row band
        # (sy_al + 24 <= hp - 8); clamped far-OOB starts still land in the
        # bottom zero pad (needs pad >= 8; pad = 2r+2 = 10 at r=4)
        sy = jnp.clip(y0.astype(jnp.int32) - radius + pad, 0, hp - 32)
        sx = jnp.clip(x0.astype(jnp.int32) - radius + pad, 0, wp - k1)
        starts += [sy, sx]
        fracs += [fy, fx]
    return jnp.stack(starts, axis=-1), jnp.stack(fracs, axis=-1)


def _make_kernel(num_levels, radius, tq):
    k = 2 * radius + 1

    def kernel(starts_ref, fracs_ref, *refs):
        level_refs = refs[:num_levels]
        out_ref = refs[num_levels]

        for qi in range(tq):
            for lvl in range(num_levels):
                sy = starts_ref[qi, 2 * lvl]
                sx = starts_ref[qi, 2 * lvl + 1]
                fy = fracs_ref[qi, 2 * lvl]
                fx = fracs_ref[qi, 2 * lvl + 1]
                # 8-aligned 24-row band load (Mosaic: dynamic sublane
                # offsets must be provably multiples of 8); rows sy..sy+k
                # land at sublanes off..off+k with off = sy % 8 < 8 and
                # off + k + 1 <= 17 <= 24
                sy_al = pl.multiple_of((sy // 8) * 8, 8)
                strip = level_refs[lvl][qi, pl.ds(sy_al, 24), :]
                strip = strip.astype(jnp.float32)      # (24, Wp)
                off = sy - sy_al
                # one-hot select matmuls for rows then lanes: each output
                # element sums exactly one nonzero product -> bit-exact
                # (Mosaic rejects a compiled dynamic lane roll here)
                wp = strip.shape[1]
                ra = jax.lax.broadcasted_iota(jnp.int32, (k + 1, 24), 0)
                rj = jax.lax.broadcasted_iota(jnp.int32, (k + 1, 24), 1)
                rsel = (rj == ra + off).astype(jnp.float32)
                band = jax.lax.dot_general(
                    rsel, strip, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                      # (k+1, Wp)
                lane = jax.lax.broadcasted_iota(jnp.int32, (wp, k + 1), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (wp, k + 1), 1)
                sel = (lane == col + sx).astype(jnp.float32)
                win = jax.lax.dot_general(
                    band, sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                # win[a, b] = C[y0+a-r, x0+b-r]
                blend = ((1.0 - fy) * (1.0 - fx) * win[:k, :k]
                         + (1.0 - fy) * fx * win[:k, 1:]
                         + fy * (1.0 - fx) * win[1:, :k]
                         + fy * fx * win[1:, 1:])
                # blend[j, i] = sample at (y + j - r, x + i - r)
                out_ref[qi, lvl] = blend

    return kernel


@functools.partial(jax.jit, static_argnames=("radius", "tq"))
def fused_corr_lookup(padded_pyramid, coords, radius=4, tq=8):
    """Lookup all levels for all queries.

    Args:
        padded_pyramid: list of (Q, Hp, Wp) from ``pad_pyramid``.
        coords: (B, H1, W1, 2) float level-0 (x, y) centroids.
        radius: window radius.
        tq: queries per program (must divide Q).
    Returns:
        (B, H1, W1, L*(2r+1)^2) f32, torch-reference channel order
        (c = l*K*K + i*K + j sampling (y + j - r, x + i - r)).
    """
    B, H1, W1, _ = coords.shape
    Q = B * H1 * W1
    L = len(padded_pyramid)
    k = 2 * radius + 1
    # pad the query axis up to the tile: the sparse weight-head path feeds
    # Q = subsample_n * 9 (e.g. 4500), which need not divide tq (r5 on-chip
    # AssertionError (4500, 8)); zero rows read in-bounds and are sliced off
    Qp = -(-Q // tq) * tq
    if Qp != Q:
        padded_pyramid = [jnp.pad(p, ((0, Qp - Q), (0, 0), (0, 0)))
                          for p in padded_pyramid]

    shapes = [p.shape for p in padded_pyramid]
    starts, fracs = _starts_and_fracs(shapes, coords.reshape(Q, 2), radius)
    if Qp != Q:
        starts = jnp.pad(starts, ((0, Qp - Q), (0, 0)))
        fracs = jnp.pad(fracs, ((0, Qp - Q), (0, 0)))
    Q_out = Q
    Q = Qp

    # starts ride per-block in SMEM: a whole-array scalar prefetch pads
    # (Q, L*2) i32 to 128 lanes and blows the 1 MB SMEM budget (found
    # on-chip r4); per-block (tq, L*2) is a few hundred bytes
    out = pl.pallas_call(
        _make_kernel(L, radius, tq),
        grid=(Q // tq,),
        in_specs=[
            pl.BlockSpec((tq, L * 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, L * 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((tq, hp, wp), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
              for (_, hp, wp) in shapes],
        ],
        out_specs=pl.BlockSpec((tq, L, k, k), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, L, k, k), jnp.float32),
    )(starts, fracs, *padded_pyramid)

    # kernel emits [l, j, i]; reference channel order is l*K*K + i*K + j
    out = jnp.swapaxes(out[:Q_out], 2, 3)
    return out.reshape(B, H1, W1, L * k * k)