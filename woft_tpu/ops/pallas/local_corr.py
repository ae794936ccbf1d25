"""Block-local correlation-volume construction as a Pallas TPU kernel.

The TPU-native replacement for the reference's CUDA correlation kernel
(ref:pytracking/external/RAFT/alt_cuda_corr/correlation_kernel.cu:19-119),
built around what this hardware is actually good at: each grid program owns
one (8, 16) query block, DMAs the block's shared source-feature window from
HBM into VMEM once, and runs ONE clean MXU matmul
(128 queries x D) @ (D x wh*ww) — no scattered fetches anywhere. The XLA
fallback path (models/corr.py:build_local_corr) produces identical values;
this kernel removes XLA's patch-materialisation copies (~3-5 ms/frame at
1080p) and is the compiled native kernel the framework ships.

Used by build_local_corr(..., use_pallas=True); interpret-mode tested on
CPU for bit-parity with the XLA path in tests/test_corr_impls.py.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(sh, sw, wh, ww, nbw, scale, p_major):
    def kernel(f1_ref, f2_ref, out_ref, win_scratch, sem):
        b = pl.program_id(0)
        by = b // nbw
        bx = b % nbw
        # x-origin quantized to the sublane tile (8) — Mosaic requires
        # provably 8-aligned Wp offsets; _local_layout budgets ww for it
        sx = pl.multiple_of((bx * sw) // 8 * 8, 8)
        dma = pltpu.make_async_copy(
            f2_ref.at[pl.ds(by * sh, wh), pl.ds(sx, ww), :],
            win_scratch,
            sem)
        dma.start()
        dma.wait()
        d = f1_ref.shape[-1]
        win = win_scratch[:].reshape(wh * ww, d)
        if p_major:
            # query-minor layout for the lookup kernel (local_lookup.py):
            # queries land in the 128 VPU lanes downstream
            corr = jax.lax.dot_general(
                win, f1_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (wh*ww, 128)
        else:
            corr = jax.lax.dot_general(
                f1_ref[0], win,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (128, wh*ww)
        out_ref[0] = (corr * scale).astype(out_ref.dtype)

    return kernel


def _corr_ref(f1b, f2pad, sh, sw, wh, ww, nbh, nbw, out_dtype, p_major):
    """XLA twin of the construction kernel (static strided-slice bands +
    one einsum per block batch) — the backward-pass oracle. Identical
    math to models/corr.py build_local_corr's XLA fallback."""
    nb, bq, d = f1b.shape
    scale = 1.0 / math.sqrt(d)
    bands = jnp.stack([
        jax.lax.slice_in_dim(f2pad, by * sh, by * sh + wh, axis=0)
        for by in range(nbh)])                             # (nbh,wh,Wp,D)
    patches = jnp.stack([
        jax.lax.slice_in_dim(bands, bx * sw // 8 * 8,
                             bx * sw // 8 * 8 + ww, axis=2)
        for bx in range(nbw)], axis=1)                     # (nbh,nbw,wh,ww,D)
    patches = patches.reshape(nbh * nbw, wh * ww, d)
    if p_major:
        corr = jnp.einsum("bpd,bqd->bpq", patches, f1b,
                          preferred_element_type=jnp.float32)
    else:
        corr = jnp.einsum("bqd,bpd->bqp", f1b, patches,
                          preferred_element_type=jnp.float32)
    return (corr * scale).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _corr_vjp(f1b, f2pad, sh, sw, wh, ww, nbh, nbw, out_dtype, p_major):
    return _corr_pallas(f1b, f2pad, sh, sw, wh, ww, nbh, nbw, out_dtype,
                        p_major)


def _corr_fwd(f1b, f2pad, sh, sw, wh, ww, nbh, nbw, out_dtype, p_major):
    out = _corr_pallas(f1b, f2pad, sh, sw, wh, ww, nbh, nbw, out_dtype,
                       p_major)
    return out, (f1b, f2pad)


def _corr_bwd(sh, sw, wh, ww, nbh, nbw, out_dtype, p_major, res, g):
    f1b, f2pad = res
    _, vjp_fn = jax.vjp(
        lambda a, b: _corr_ref(a, b, sh, sw, wh, ww, nbh, nbw, out_dtype,
                               p_major), f1b, f2pad)
    return vjp_fn(g)


_corr_vjp.defvjp(_corr_fwd, _corr_bwd)


@functools.partial(jax.jit,
                   static_argnames=("sh", "sw", "wh", "ww", "nbh", "nbw",
                                    "out_dtype", "p_major"))
def block_local_corr(f1b, f2pad, sh, sw, wh, ww, nbh, nbw, out_dtype,
                     p_major=False):
    """corr[b, q, p] = <f1b[b, q], window_b.reshape(-1, D)[p]> * scale.

    Args:
        f1b: (nb, BQ, D) blocked query features (BQ typically 128).
        f2pad: (Hp, Wp, D) zero-padded (pooled) target features.
        sh, sw: block window stride; wh, ww: window size; nbh*nbw = nb.
        out_dtype: volume dtype.
        p_major: emit (nb, wh*ww, BQ) instead (query-minor — the layout
            the Pallas lookup kernel consumes; same matmul, swapped
            operands, so no transpose exists anywhere).
    Returns:
        (nb, BQ, wh*ww), or (nb, wh*ww, BQ) when ``p_major``.
        Differentiable w.r.t. f1b/f2pad (jax.custom_vjp; backward via the
        XLA twin `_corr_ref` — the reference kernel's bwd analog,
        ref:alt_cuda_corr/correlation_kernel.cu:122-256).
    """
    return _corr_vjp(f1b, f2pad, sh, sw, wh, ww, nbh, nbw, out_dtype,
                     p_major)


def _corr_pallas(f1b, f2pad, sh, sw, wh, ww, nbh, nbw, out_dtype, p_major):
    nb, bq, d = f1b.shape
    scale = 1.0 / math.sqrt(d)
    out_shape = ((nb, wh * ww, bq) if p_major else (nb, bq, wh * ww))

    return pl.pallas_call(
        _make_kernel(sh, sw, wh, ww, nbw, scale, p_major),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1,) + out_shape[1:], lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        scratch_shapes=[
            pltpu.VMEM((wh, ww, d), f2pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(f1b, f2pad)
