"""Block-local correlation *lookup* as a Pallas TPU kernel.

The companion to ops/pallas/local_corr.py (construction): together they are
the TPU-native replacement for the reference's fused CUDA window sampler
(ref:pytracking/external/RAFT/alt_cuda_corr/correlation_kernel.cu:19-119).

Why a kernel: the per-iteration RAFT lookup bilinearly samples a
(2r+1)^2 window per query from that query's stored block-local window.
Every XLA formulation measured on the real chip loses badly:

- per-query gathers: scalar-unit bound (2.6 s/frame @720p, r1)
- one-hot MXU matmuls: per-query (10, wh) x (wh, ww) batched *tiny*
  matmuls that XLA lowers to ~80 GFLOP/s loop fusions — 57 ms of a
  132 ms 1080p frame (r3 trace)
- an XLA "slab" sum over window start positions: XLA materializes every
  masked broadcast term in a (Q, wh, 9) layout (9 of 128 lanes used) —
  measured 160 ms/frame, WORSE than one-hot (r3, kept for the record)

The kernel keeps the slab formulation but owns the layout: volumes are
stored **query-minor** (nb, wh, ww, bq) so the 128 queries of a block sit
in the 128 VPU lanes. The bilinear y-blend folds into a two-hot weight
over the (wh - k + 1) possible k-row slab starts:

    acc1[j, w, q] = sum_s wy[s, q] * vol[s + j, w, q]      (leading-dim
                                                            static slices)
    out[j, i, q]  = sum_t wx[t, q] * acc1[j, t + i, q]     (sublane static
                                                            slices)

Every term is a full-lane VPU multiply-add against a per-query lane
vector — no gathers, no matmuls, no relayouts. f32 accumulation from the
bf16 volume happens in-register (the old path materialized f32 copies of
the whole volume in HBM: 18 ms/frame).

NOTE the output channel order is (j, i) row-major = y-major — the
TRANSPOSE of the torch lookup order c = i*k + j. Consumers either fold
the swap into their channel-reduction weights (models/raft.py blocked
motion encoder) or transpose once when converting to the natural layout
(models/corr.py corr_lookup_local for p-layout volumes).

Gradients: the reference CUDA sampler ships fwd+bwd
(ref:pytracking/external/RAFT/alt_cuda_corr/correlation_kernel.cu:122-256);
here each kernel carries a jax.custom_vjp whose backward differentiates an
XLA twin of the same slab math (`_lookup_ref` / `_fine_multi_ref`) — the
Pallas forward stays on the hot path while train-time cotangents come from
fusible XLA shifted-adds (training runs at small resolutions where the XLA
formulation is fine). Weight cotangents (d_wy/d_wx, i.e. coordinate
gradients) are computed exactly but are dead code in RAFT training (coords
are detached per iteration, ref:weighted_raft.py:229) and get DCE'd.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _slab_blend(win, wy, wx, k):
    """XLA twin of one block's slab blend: (wh, ww, bq) f32 window +
    two-hot slab-start weights -> (k*k, bq) f32, c = j*k + i."""
    nsf = win.shape[0] - k + 1
    ntf = win.shape[1] - k + 1
    acc1 = win[0:k] * wy[0][None, None, :]
    for s in range(1, nsf):
        acc1 = acc1 + win[s:s + k] * wy[s][None, None, :]
    acc2 = acc1[:, 0:k, :] * wx[0][None, None, :]
    for t in range(1, ntf):
        acc2 = acc2 + acc1[:, t:t + k, :] * wx[t][None, None, :]
    return acc2.reshape(k * k, win.shape[-1])


def _make_kernel(wh, ww, k):
    n_s = wh - k + 1
    n_t = ww - k + 1

    def kernel(vol_ref, wy_ref, wx_ref, out_ref):
        vol = vol_ref[0]                                   # (wh, ww, bq)
        f32 = jnp.float32
        # stage 1: y slab-blend — (k, ww, bq), leading-dim slices are free
        acc1 = vol[0:k].astype(f32) * wy_ref[0, 0][None, None, :]
        for s in range(1, n_s):
            acc1 = acc1 + (vol[s:s + k].astype(f32)
                           * wy_ref[0, s][None, None, :])
        # stage 2: x slab-blend — (k, k, bq), sublane shifts
        acc2 = acc1[:, 0:k, :] * wx_ref[0, 0][None, None, :]
        for t in range(1, n_t):
            acc2 = acc2 + acc1[:, t:t + k, :] * wx_ref[0, t][None, None, :]
        out_ref[0] = acc2.reshape(k * k, vol.shape[-1])    # (j*k+i, bq)

    return kernel


def _make_fine_kernel(wh, ww, fr, fc, k, dtype):
    nsf = fr - k + 1
    ntf = fc - k + 1

    def kernel(rc_ref, vol_ref, wyf_ref, wxf_ref, out_ref, win, sem):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def copy(i, slot):
            r0 = rc_ref[i, 0]
            # column anchors are built 8-aligned
            # (corr._fine_anchor_weights); the hint lets Mosaic prove the
            # sublane-dim offset rule
            c0 = pl.multiple_of(rc_ref[i, 1], 8)
            return pltpu.make_async_copy(
                vol_ref.at[i, pl.ds(r0, fr), pl.ds(c0, fc), :],
                win.at[slot], sem.at[slot])

        # double-buffered DMA: block b+1's sub-window streams in while
        # block b computes (255 sequential DMA-wait-compute rounds were
        # latency-bound otherwise)
        slot = jax.lax.rem(b, 2)

        @pl.when(b == 0)
        def _():
            copy(0, 0).start()

        @pl.when(b + 1 < nb)
        def _():
            copy(b + 1, jax.lax.rem(b + 1, 2)).start()

        copy(b, slot).wait()
        f32 = jnp.float32
        v = win[slot]
        acc1 = v[0:k].astype(f32) * wyf_ref[0, 0][None, None, :]
        for s in range(1, nsf):
            acc1 = acc1 + (v[s:s + k].astype(f32)
                           * wyf_ref[0, s][None, None, :])
        acc2 = acc1[:, 0:k, :] * wxf_ref[0, 0][None, None, :]
        for t in range(1, ntf):
            acc2 = acc2 + acc1[:, t:t + k, :] * wxf_ref[0, t][None, None, :]
        out_ref[0] = acc2.reshape(k * k, v.shape[-1]).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "fr", "fc", "out_dtype"))
def block_local_lookup_fine(rc0, vol, wyf, wxf, k, fr, fc, out_dtype=None):
    """Fine-slab bilinear window lookup: dynamic sub-window DMA.

    The full-slab kernel (`block_local_lookup`) blends over EVERY possible
    slab start in the stored window — n_s = wh-k+1 (42 at margin 16) VPU
    terms per block, of which a two-hot weight uses exactly 2. This
    variant exploits that queries within one block are spatially adjacent
    (8x16 neighbouring cells of a smooth flow field): a per-block anchor
    (r0, c0) — row arbitrary, column 8-aligned for the Mosaic sublane
    rule — positions an (fr, fc) sub-window (24x24 default) that covers
    every query's bilinear footprint, and only fr-k+1 (16) starts are
    blended over fc (24) columns: ~11x fewer VPU FLOPs and ~5.6x less
    HBM read than the full slab, independent of the stored margin.

    Exactness: identical to the full slab whenever each query's slab
    start falls inside the fine range — i.e. intra-block start spread
    <= fr-k-1 rows / (fc-k-1 minus alignment loss) columns. Callers clamp
    relative starts into range (corr._fine_slab_weights), which reproduces
    the stored-window-edge saturation semantics, now relative to the
    block's own fine window (ref:alt_cuda_corr/correlation_kernel.cu
    fwd clamping behavior).

    Args:
        rc0: (nb, 2) int32 [r0, c0] per block; c0 multiple of 8.
        vol: (nb, wh, ww, bq) stored p-layout volume (stays in HBM; the
            kernel DMAs only its fine sub-window).
        wyf: (nb, fr-k+1, bq) f32 two-hot weights relative to r0.
        wxf: (nb, fc-k+1, bq) f32, relative to c0.
        k: window size; fr, fc: fine sub-window extent (<= wh/ww).
        out_dtype: result storage dtype (default f32). Accumulation is
            always f32; bf16 here only rounds the stored window values —
            the bf16-mode motion encoder consumes them in bf16 anyway,
            and it halves the write+read traffic of the 12x GRU loop.
    Returns:
        (nb, k*k, bq) out_dtype, channel order c = j*k + i (y-major).
    """
    nb, wh, ww, bq = vol.shape
    nsf = fr - k + 1
    ntf = fc - k + 1
    assert fr <= wh and fc <= ww, (fr, fc, wh, ww)
    assert wyf.shape == (nb, nsf, bq), (wyf.shape, (nb, nsf, bq))
    assert wxf.shape == (nb, ntf, bq), (wxf.shape, (nb, ntf, bq))
    out_dtype = jnp.float32 if out_dtype is None else out_dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, nsf, bq), lambda b, rc: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ntf, bq), lambda b, rc: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * k, bq), lambda b, rc: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, fr, fc, bq), vol.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_fine_kernel(wh, ww, fr, fc, k, vol.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, k * k, bq), out_dtype),
    )(rc0, vol, wyf, wxf)


def _make_fine_multi_kernel(k, exts, L):
    def kernel(rc_ref, *refs):
        vol_refs = refs[:L]
        wyf_refs = refs[L:2 * L]
        wxf_refs = refs[2 * L:3 * L]
        out_ref = refs[3 * L]
        wins = refs[3 * L + 1:3 * L + 1 + L]
        sems = refs[3 * L + 1 + L:]
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def copy(l, i, slot):
            fr, fc = exts[l]
            r0 = rc_ref[i, l, 0]
            c0 = pl.multiple_of(rc_ref[i, l, 1], 8)
            return pltpu.make_async_copy(
                vol_refs[l].at[i, pl.ds(r0, fr), pl.ds(c0, fc), :],
                wins[l].at[slot], sems[l].at[slot])

        slot = jax.lax.rem(b, 2)

        @pl.when(b == 0)
        def _():
            for l in range(L):
                copy(l, 0, 0).start()

        @pl.when(b + 1 < nb)
        def _():
            nslot = jax.lax.rem(b + 1, 2)
            for l in range(L):
                copy(l, b + 1, nslot).start()

        f32 = jnp.float32
        outs = []
        for l in range(L):
            copy(l, b, slot).wait()
            fr, fc = exts[l]
            nsf = fr - k + 1
            ntf = fc - k + 1
            v = wins[l][slot]
            acc1 = v[0:k].astype(f32) * wyf_refs[l][0, 0][None, None, :]
            for s in range(1, nsf):
                acc1 = acc1 + (v[s:s + k].astype(f32)
                               * wyf_refs[l][0, s][None, None, :])
            acc2 = acc1[:, 0:k, :] * wxf_refs[l][0, 0][None, None, :]
            for t in range(1, ntf):
                acc2 = acc2 + (acc1[:, t:t + k, :]
                               * wxf_refs[l][0, t][None, None, :])
            outs.append(acc2.reshape(k * k, v.shape[-1]))
        # one store: per-level sublane offsets (l*81) aren't tile-aligned
        out_ref[0] = jnp.concatenate(outs, axis=0).astype(out_ref.dtype)

    return kernel


def _fine_multi_pallas(rcs, vols, wyfs, wxfs, k, exts, out_dtype):
    L = len(vols)
    nb, _, _, bq = vols[0].shape
    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(L)]
    for w in (wyfs, wxfs):
        for a in w:
            n = a.shape[1]
            in_specs.append(pl.BlockSpec((1, n, bq), lambda b, rc: (b, 0, 0),
                                         memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L * k * k, bq),
                               lambda b, rc: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((2,) + exts[l] + (bq,), vols[l].dtype)
             for l in range(L)]
            + [pltpu.SemaphoreType.DMA((2,)) for _ in range(L)]),
    )
    return pl.pallas_call(
        _make_fine_multi_kernel(k, exts, L),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, L * k * k, bq), out_dtype),
    )(rcs, *vols, *wyfs, *wxfs)


def _fine_multi_ref(rcs, vols, wyfs, wxfs, k, exts, out_dtype):
    """XLA twin of the fine-multi kernel (same math, vmapped dynamic
    slices instead of per-block DMAs) — the backward-pass oracle."""
    f32 = jnp.float32
    outs = []
    for l, (vol, wyf, wxf, (fr, fc)) in enumerate(zip(vols, wyfs, wxfs,
                                                      exts)):
        bq = vol.shape[-1]

        def one(vol_b, rc_b, wy_b, wx_b):
            win = jax.lax.dynamic_slice(
                vol_b, (rc_b[0], rc_b[1], 0),
                (fr, fc, bq)).astype(f32)
            return _slab_blend(win, wy_b, wx_b, k)

        outs.append(jax.vmap(one)(vol, rcs[:, l], wyf, wxf))
    return jnp.concatenate(outs, axis=1).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fine_multi_vjp(k, exts, out_dtype, rcs, vols, wyfs, wxfs):
    return _fine_multi_pallas(rcs, list(vols), list(wyfs), list(wxfs), k,
                              exts, out_dtype)


def _fine_multi_fwd(k, exts, out_dtype, rcs, vols, wyfs, wxfs):
    out = _fine_multi_vjp(k, exts, out_dtype, rcs, vols, wyfs, wxfs)
    return out, (rcs, vols, wyfs, wxfs)


def _fine_multi_bwd(k, exts, out_dtype, res, g):
    rcs, vols, wyfs, wxfs = res
    _, vjp_fn = jax.vjp(
        lambda v, a, b: _fine_multi_ref(rcs, list(v), list(a), list(b), k,
                                        exts, out_dtype), vols, wyfs, wxfs)
    d_vols, d_wyfs, d_wxfs = vjp_fn(g)
    d_rcs = np.zeros(rcs.shape, jax.dtypes.float0)     # int anchors
    return d_rcs, d_vols, d_wyfs, d_wxfs


_fine_multi_vjp.defvjp(_fine_multi_fwd, _fine_multi_bwd)


def block_local_lookup_fine_multi(rcs, vols, wyfs, wxfs, k, exts,
                                  out_dtype=None):
    """All pyramid levels' fine-slab lookups in ONE kernel launch.

    Four separate `block_local_lookup_fine` calls pay the per-block grid
    step + DMA issue cost four times; measured on v5e the small levels
    cost nearly as much as level 0 (~0.6 us/block fixed overhead). This
    variant runs one 255-step grid, keeps all L levels' sub-window DMAs
    in flight together (double-buffered), and emits the concatenated
    (nb, L*k*k, bq) lookup directly — the exact layout the blocked motion
    encoder consumes.

    Differentiable w.r.t. vols/wyfs/wxfs (jax.custom_vjp; backward via
    the XLA twin `_fine_multi_ref` — see module docstring). The int32
    anchors get a symbolic-zero cotangent.

    Args:
        rcs: (nb, L, 2) int32 per-level [r0, c0]; c0 multiples of 8.
        vols: list of L (nb, wh_l, ww_l, bq) p-layout volumes (HBM).
        wyfs/wxfs: per-level two-hot weights as in block_local_lookup_fine.
        k: window size; exts: tuple of L (fr, fc) fine extents.
    Returns:
        (nb, L*k*k, bq) out_dtype, level-major, c = j*k + i within level.
    """
    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    return _fine_multi_vjp(k, tuple(exts), out_dtype, rcs, tuple(vols),
                           tuple(wyfs), tuple(wxfs))


def _lookup_ref(vol, wy, wx, k):
    """XLA twin of the full-slab kernel — the backward-pass oracle."""
    return jax.vmap(lambda v, a, b: _slab_blend(v.astype(jnp.float32), a,
                                                b, k))(vol, wy, wx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lookup_vjp(k, vol, wy, wx):
    return _lookup_pallas(vol, wy, wx, k)


def _lookup_fwd(k, vol, wy, wx):
    return _lookup_pallas(vol, wy, wx, k), (vol, wy, wx)


def _lookup_bwd(k, res, g):
    vol, wy, wx = res
    _, vjp_fn = jax.vjp(lambda v, a, b: _lookup_ref(v, a, b, k),
                        vol, wy, wx)
    return vjp_fn(g)


_lookup_vjp.defvjp(_lookup_fwd, _lookup_bwd)


@functools.partial(jax.jit, static_argnames=("k",))
def block_local_lookup(vol, wy, wx, k):
    """Bilinear window lookup against a query-minor block-local volume.

    Args:
        vol: (nb, wh, ww, bq) — block b's stored window rows for its bq
            queries, queries minor (ops/pallas/local_corr.py p-layout).
        wy: (nb, n_s, bq) f32 two-hot slab-start weights over rows,
            n_s = wh - k + 1; wy[b, s, q] = (1-fy)*[s == y0-r]
            + fy*[s == y0-r+1] with coords pre-clamped fully in range.
        wx: (nb, n_t, bq) f32, same over columns.
        k: window size (2*radius + 1).
    Returns:
        (nb, k*k, bq) f32 — channel order c = j*k + i (y-major; see
        module docstring). Differentiable w.r.t. all three operands
        (jax.custom_vjp; backward via the XLA twin `_lookup_ref`).
    """
    nb, wh, ww, bq = vol.shape
    n_s = wh - k + 1
    n_t = ww - k + 1
    assert wy.shape == (nb, n_s, bq), (wy.shape, (nb, n_s, bq))
    assert wx.shape == (nb, n_t, bq), (wx.shape, (nb, n_t, bq))
    return _lookup_vjp(k, vol, wy, wx)


def _lookup_pallas(vol, wy, wx, k):
    nb, wh, ww, bq = vol.shape
    n_s = wh - k + 1
    n_t = ww - k + 1
    return pl.pallas_call(
        _make_kernel(wh, ww, k),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, wh, ww, bq), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_s, bq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_t, bq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * k, bq), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, k * k, bq), jnp.float32),
    )(vol, wy, wx)
