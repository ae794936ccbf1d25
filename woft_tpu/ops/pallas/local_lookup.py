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
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
        module docstring).
    """
    nb, wh, ww, bq = vol.shape
    n_s = wh - k + 1
    n_t = ww - k + 1
    assert wy.shape == (nb, n_s, bq), (wy.shape, (nb, n_s, bq))
    assert wx.shape == (nb, n_t, bq), (wx.shape, (nb, n_t, bq))

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
