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
- Mosaic allows dynamic slicing only on sublanes, so the row band is
  dynamically sliced and the column offset is applied with a dynamic lane
  roll; all levels are processed in one kernel,
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
    Mosaic-native tiles (sublane x8, lane x128); window starts are clamped
    to the symmetric-pad region so the alignment tail is never read."""
    pad = _pad_amount(radius)
    out = []
    for corr in pyramid:
        if dtype is not None:
            corr = corr.astype(dtype)
        _, h, w = corr.shape
        hp = h + 2 * pad
        wp = w + 2 * pad
        extra_h = (-hp) % 8
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
        sy = jnp.clip(y0.astype(jnp.int32) - radius + pad, 0, hp - k1)
        sx = jnp.clip(x0.astype(jnp.int32) - radius + pad, 0, wp - k1)
        starts += [sy, sx]
        fracs += [fy, fx]
    return jnp.stack(starts, axis=-1), jnp.stack(fracs, axis=-1)


def _make_kernel(num_levels, radius, tq):
    k = 2 * radius + 1

    def kernel(starts_ref, fracs_ref, *refs):
        level_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        prog = pl.program_id(0)

        for qi in range(tq):
            q = prog * tq + qi
            for lvl in range(num_levels):
                sy = starts_ref[q, 2 * lvl]
                sx = starts_ref[q, 2 * lvl + 1]
                fy = fracs_ref[qi, 2 * lvl]
                fx = fracs_ref[qi, 2 * lvl + 1]
                # dynamic sublane slice of the row band, full lanes
                strip = level_refs[lvl][qi, pl.ds(sy, k + 1), :]
                strip = strip.astype(jnp.float32)
                # bring column sx to lane 0 with a dynamic roll, then a
                # static lane slice gives the (K+1, K+1) window
                rolled = pltpu.roll(strip, -sx, 1)
                win = rolled[:, :k + 1]          # win[a, b] = C[y0+a-r, x0+b-r]
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
    assert Q % tq == 0, (Q, tq)

    shapes = [p.shape for p in padded_pyramid]
    starts, fracs = _starts_and_fracs(shapes, coords.reshape(Q, 2), radius)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // tq,),
        in_specs=[
            pl.BlockSpec((tq, L * 2), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((tq, hp, wp), lambda i, *_: (i, 0, 0),
                           memory_space=pltpu.VMEM)
              for (_, hp, wp) in shapes],
        ],
        out_specs=pl.BlockSpec((tq, L, k, k), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        _make_kernel(L, radius, tq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, L, k, k), jnp.float32),
    )(starts, fracs, *padded_pyramid)

    # kernel emits [l, j, i]; reference channel order is l*K*K + i*K + j
    out = jnp.swapaxes(out, 2, 3)
    return out.reshape(B, H1, W1, L * k * k)