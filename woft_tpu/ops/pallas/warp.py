"""Block-recentered perspective warp as a Pallas TPU kernel.

The tracker pre-warp (ref:YAOF_tracker_single_control.py:89-91
``cv2.warpPerspective``) is a bilinear gather of ~2M scattered points at
1080p — the single most expensive op in the full-frame pipeline (57 ms of
scalar-unit gather time per frame, xprof r2). This kernel restates it the
same way ``build_local_corr`` restated correlation: output pixels are
grouped into (8, 128) blocks; each block DMAs ONE shared source patch
around its own back-projected footprint and resolves its 1024 bilinear
samples with an MXU matmul over the patch columns plus a cheap row select:

    X[w, p]  = (w == rx0[p]) wx0[p] + (w == rx1[p]) wx1[p]   (pw, 1024)
    T        = patch.reshape(C*ph, pw) @ X                   (C*ph, 1024)
    out[c,p] = sum_r A[r, p] * T[c*ph + r, p]                row select

where (rx, ry) are patch-local corner indices and the four grid_sample
zero-padding validity bits are folded into the bilinear weights — the
result is bit-exact vs ``ops.warp.grid_sample`` whenever every valid
corner of a block fits its patch (the *envelope*). ``plan_block_warp``
checks the envelope analytically from the coordinates alone, so callers
run this kernel under a ``lax.cond`` with the gather path as the
out-of-envelope fallback (large rotations/scales).

Alignment: patch origins are quantized to the (8, 128) sublane/lane tile
(Mosaic DMA requirement), which the patch margins budget for.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BH, _BW = 8, 128            # output pixels per block (sublane x lane)
_BQ = _BH * _BW


def _round_up(v, m):
    return -(-v // m) * m


def _make_kernel(C, ph, pw, precision):
    def kernel(bases_ref, ints_ref, wts_ref, src_ref, out_ref,
               patch, sem):
        b = pl.program_id(0)
        by = pl.multiple_of(bases_ref[b, 0], 8)
        bx = pl.multiple_of(bases_ref[b, 1], 128)
        # one DMA per channel: dynamic offsets only on the two trailing
        # dims (the compiled Mosaic path miscopies a 3-D slice whose
        # leading dim is full while trailing offsets are dynamic)
        dmas = [pltpu.make_async_copy(
            src_ref.at[c, pl.ds(by, ph), pl.ds(bx, pw)], patch.at[c],
            sem.at[c]) for c in range(C)]
        for dma in dmas:
            dma.start()

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (pw, _BQ), 0)
        rx0 = ints_ref[0, 0:1, :]                       # (1, BQ)
        rx1 = ints_ref[0, 1:2, :]
        wx0 = wts_ref[0, 0:1, :]
        wx1 = wts_ref[0, 1:2, :]
        X = (jnp.where(iota_w == rx0, wx0, 0.0)
             + jnp.where(iota_w == rx1, wx1, 0.0))      # (pw, BQ)

        iota_r = jax.lax.broadcasted_iota(jnp.int32, (ph, _BQ), 0)
        ry0 = ints_ref[0, 2:3, :]
        ry1 = ints_ref[0, 3:4, :]
        wy0 = wts_ref[0, 2:3, :]
        wy1 = wts_ref[0, 3:4, :]
        A = (jnp.where(iota_r == ry0, wy0, 0.0)
             + jnp.where(iota_r == ry1, wy1, 0.0))      # (ph, BQ)

        for dma in dmas:
            dma.wait()
        P2 = patch[:].reshape(C * ph, pw)
        # precision matters: at DEFAULT the TPU MXU runs this f32 matmul
        # as bf16 passes (intensity error ~0.5/255-scale); HIGHEST makes
        # the kernel bit-exact vs the gather path (the parity default)
        T = jax.lax.dot_general(
            P2, X.astype(P2.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)          # (C*ph, BQ)
        out = jnp.sum(T.reshape(C, ph, _BQ)
                      * A[None].astype(jnp.float32), axis=1)
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


def _plan_stats(coords, src_hw):
    """Patch-size-independent per-block statistics (the heavy part of
    planning): blocked corner indices/weights + valid-corner extents.
    Shared across patch tiers (`plan_block_warp_multi`)."""
    H_out, W_out = coords.shape[:2]
    H_src, W_src = src_hw
    nby = -(-H_out // _BH)
    nbx = -(-W_out // _BW)
    nb = nby * nbx

    c = jnp.pad(coords, ((0, nby * _BH - H_out), (0, nbx * _BW - W_out),
                         (0, 0)), constant_values=-1e9)
    x = c[..., 0]
    y = c[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    okx0 = (x0 >= 0) & (x0 < W_src)
    okx1 = (x0 + 1 >= 0) & (x0 + 1 < W_src)
    oky0 = (y0 >= 0) & (y0 < H_src)
    oky1 = (y0 + 1 >= 0) & (y0 + 1 < H_src)
    wx0 = (1.0 - fx) * okx0
    wx1 = fx * okx1
    wy0 = (1.0 - fy) * oky0
    wy1 = fy * oky1

    def blocked(a):
        return (a.reshape(nby, _BH, nbx, _BW)
                .transpose(0, 2, 1, 3).reshape(nb, _BQ))

    bx0, bx1 = blocked(x0), blocked(x0 + 1)
    by0, by1 = blocked(y0), blocked(y0 + 1)
    bwx0, bwx1 = blocked(wx0), blocked(wx1)
    bwy0, bwy1 = blocked(wy0), blocked(wy1)

    BIG = jnp.int32(1 << 29)
    # per-block extent of VALID corner columns/rows (zero-weight corners
    # are free to clamp anywhere)
    def extent(i0, w0, i1, w1):
        lo = jnp.minimum(
            jnp.min(jnp.where(w0 > 0, i0, BIG), axis=1),
            jnp.min(jnp.where(w1 > 0, i1, BIG), axis=1))        # (nb,)
        hi = jnp.maximum(
            jnp.max(jnp.where(w0 > 0, i0, -BIG), axis=1),
            jnp.max(jnp.where(w1 > 0, i1, -BIG), axis=1))
        return lo, hi

    xlo, xhi = extent(bx0, bwx0, bx1, bwx1)
    ylo, yhi = extent(by0, bwy0, by1, bwy1)

    wts = jnp.stack([bwx0, bwx1, bwy0, bwy1], axis=1)            # (nb,4,BQ)
    return dict(nby=nby, nbx=nbx, corners=(bx0, bx1, by0, by1),
                wts=wts.astype(jnp.float32),
                extents=(xlo, xhi, ylo, yhi))


def _plan_tier(stats, src_hw, ph, pw, Hp, Wp):
    """Finish a plan for one (ph, pw) patch tier from shared stats.
    ``Hp``/``Wp`` is the padded source size actually staged (>= this
    tier's own requirement when sharing one padded source)."""
    bx0, bx1, by0, by1 = stats["corners"]
    xlo, xhi, ylo, yhi = stats["extents"]

    base_x = jnp.clip((xlo // 128) * 128, 0, Wp - pw)
    base_y = jnp.clip((ylo // 8) * 8, 0, Hp - ph)
    # empty blocks (no valid corner): xhi < xlo sentinel-wise -> ok
    ok_x = (xhi < xlo) | ((xhi >= base_x) & (xhi < base_x + pw))
    ok_y = (yhi < ylo) | ((yhi >= base_y) & (yhi < base_y + ph))
    ok = jnp.all(ok_x & ok_y)

    ints = jnp.stack([
        jnp.clip(bx0 - base_x[:, None], 0, pw - 1),
        jnp.clip(bx1 - base_x[:, None], 0, pw - 1),
        jnp.clip(by0 - base_y[:, None], 0, ph - 1),
        jnp.clip(by1 - base_y[:, None], 0, ph - 1)], axis=1)     # (nb,4,BQ)
    bases = jnp.stack([base_y, base_x], axis=-1)                 # (nb, 2)

    return dict(bases=bases.astype(jnp.int32), ints=ints,
                wts=stats["wts"], ok=ok,
                nby=stats["nby"], nbx=stats["nbx"], Hp=Hp, Wp=Wp)


def plan_block_warp(coords, src_hw, ph=48, pw=384):
    """Precompute the kernel's per-block/per-pixel operands (pure XLA).

    Args:
        coords: (H_out, W_out, 2) f32 source (x, y) sample positions.
        src_hw: (H_src, W_src) source image size.
        ph, pw: patch size (statics; sublane x lane).
    Returns:
        dict with bases (nb, 2) i32, ints (nb, 4, BQ) i32,
        wts (nb, 4, BQ) f32, ok () bool, grid metadata.
    """
    H_src, W_src = src_hw
    Hp = _round_up(H_src, 8) + ph
    Wp = _round_up(W_src, 128) + pw
    return _plan_tier(_plan_stats(coords, src_hw), src_hw, ph, pw, Hp, Wp)


def plan_block_warp_multi(coords, src_hw, tiers=((32, 256), (48, 384))):
    """Plans for several patch tiers, heavy per-block stats shared.

    The kernel's matmul cost scales with patch AREA (C*ph x pw @ pw x
    1024 per block), so a steady-state tracker should run the smallest
    patch whose envelope holds and only escalate on large poses. All
    tiers share one padded source sized for the LARGEST tier. Returns a
    list of plans ordered as ``tiers`` (cheapest first by convention).
    """
    H_src, W_src = src_hw
    ph_max = max(t[0] for t in tiers)
    pw_max = max(t[1] for t in tiers)
    Hp = _round_up(H_src, 8) + ph_max
    Wp = _round_up(W_src, 128) + pw_max
    stats = _plan_stats(coords, src_hw)
    return [_plan_tier(stats, src_hw, ph, pw, Hp, Wp) for ph, pw in tiers]


@functools.partial(jax.jit,
                   static_argnames=("nby", "nbx", "ph", "pw", "interpret",
                                    "precision"))
def block_warp(src_chw, bases, ints, wts, nby, nbx, ph=48, pw=384,
               interpret=False, precision="highest"):
    """Run the kernel: src (C, Hp, Wp) + plan operands -> (nb, C, BQ)."""
    C = src_chw.shape[0]
    nb = nby * nbx
    return pl.pallas_call(
        _make_kernel(C, ph, pw, jax.lax.Precision(precision)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 4, _BQ), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4, _BQ), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, C, _BQ), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((C, ph, pw), src_chw.dtype),
                pltpu.SemaphoreType.DMA((C,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((nb, C, _BQ), src_chw.dtype),
        interpret=interpret,
    )(bases, ints, wts, src_chw)


def warp_bilinear_blocked(img, coords, ph=48, pw=384, interpret=False,
                          precision="highest"):
    """Bilinear-sample ``img`` (N=1, H, W, C) at ``coords``
    (H_out, W_out, 2) via the block kernel, assuming the caller checked
    ``plan['ok']``. Returns (1, H_out, W_out, C) matching
    ``ops.warp.grid_sample`` semantics (zero OOB padding)."""
    plan = plan_block_warp(coords, img.shape[1:3], ph, pw)
    return warp_bilinear_from_plan(img, plan, coords.shape[0],
                                   coords.shape[1], ph, pw, interpret,
                                   precision)


def warp_bilinear_from_plan(img, plan, H_out, W_out, ph=48, pw=384,
                            interpret=False, precision="highest",
                            stage_dtype=None):
    """``stage_dtype``: optional dtype the padded source is staged (and
    DMA'd) in. bf16 staging is EXACT for uint8-valued frames (all
    integers 0..256 are bf16-representable) and halves the kernel's DMA
    traffic; with the 'default'-precision blend matmul (already a bf16
    MXU pass) it adds no rounding beyond what that mode accepts. The
    result is cast back to the input dtype."""
    H_src, W_src = img.shape[1:3]
    C = img.shape[-1]
    src = jnp.transpose(img[0], (2, 0, 1))                   # (C, H, W)
    if stage_dtype is not None:
        src = src.astype(stage_dtype)
    src = jnp.pad(src, ((0, 0), (0, plan["Hp"] - H_src),
                        (0, plan["Wp"] - W_src)))
    out = block_warp(src, plan["bases"], plan["ints"], plan["wts"],
                     plan["nby"], plan["nbx"], ph, pw, interpret,
                     precision)
    out = out.astype(img.dtype)
    nby, nbx = plan["nby"], plan["nbx"]
    out = (out.reshape(nby, nbx, C, _BH, _BW)
           .transpose(2, 0, 3, 1, 4)
           .reshape(C, nby * _BH, nbx * _BW)[:, :H_out, :W_out])
    return jnp.transpose(out, (1, 2, 0))[None]               # (1,H,W,C)
