"""Fused SepConvGRU gated update as Pallas TPU kernels.

The reference SepConvGRU (ref:pytracking/external/RAFT/raft_core/
update.py:33-60) runs a horizontal (1x5) then a vertical (5x1) gated
update 12x per frame. In XLA each direction is 2 convs + 6 elementwise
stages, every one of which round-trips a (H/8, W/8, 128..256) activation
through HBM — at 1080p that is ~250 MB of intermediate traffic per
iteration for ~64 GFLOP of matmul work, and the measured loop runs at
~30% MFU.

These kernels fuse one whole gated update — zr conv, sigmoid gates,
r*h masking, q conv, tanh, convex blend — into a single VMEM-resident
pass. The split into two launches (one per direction) is what makes the
tiling halo-free:

- the 1x5 update only convolves along W  -> tile over ROWS, no halo
- the 5x1 update only convolves along H  -> tile over COLS, no halo

The conv's zero padding becomes static zero guard columns/rows baked
into the padded inputs (`sep_conv_gru_pallas` does the padding), so
every tap is a static slice + one MXU matmul; no gathers, no dynamic
offsets, no cross-block dependencies.

The q conv reads cat(r*h, x) at +-2 taps, so r (hence zr) is computed on
a 4-wider span than the output; the extra zr columns/rows multiply h=0
guards in the true computation, so their (finite) values never reach the
output — see the in-line notes.

Numerics mirror models/raft.py `_gru_gates` in bf16 mode exactly by
construction: bf16 operands, f32 MXU accumulation, +bias in f32, round
to bf16, +pre in bf16, bf16 gates, f32 convex blend against the f32
carry. The loop-invariant context contribution `pre` (see
raft.precompute_gru_context) is required — the production tracker always
hoists it. bf16-mode only (a 'highest' twin would need 6-pass matmuls
in-kernel; the XLA path stays the parity reference).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BF16 = jnp.bfloat16
_F32 = jnp.float32


def _shift(a, d, t, size):
    """Static slice [t : t+size] of `a` along dim `d` (0 or 1 of 3)."""
    return a[t:t + size] if d == 0 else a[:, t:t + size]


def _make_kernel(d, span, out_span):
    """One gated update, convolving along dim `d` of (A, B, C) blocks.

    span = conv-input extent along d (out_span + 8);
    out_span = output extent along d. The zr conv emits out_span + 4
    (the extra +-2 feeds r for the q conv's taps).
    """
    mid = out_span + 4

    def kernel(h_ref, x_ref, pzr_ref, pq_ref, wzr_ref, wq_ref, bzr_ref,
               bq_ref, out_ref):
        h = h_ref[0]                                     # (A, B, 128) f32
        x = x_ref[0]                                     # (A, B, 128) bf16
        hx = jnp.concatenate([h.astype(_BF16), x], -1)   # (A, B, 256)

        def conv(inp, w_ref, n):
            acc = jax.lax.dot_general(
                _shift(inp, d, 0, n), w_ref[0],
                (((2,), (0,)), ((), ())),
                preferred_element_type=_F32)
            for t in range(1, 5):
                acc = acc + jax.lax.dot_general(
                    _shift(inp, d, t, n), w_ref[t],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=_F32)
            return acc

        def conv2(in_a, in_b, w_ref, n):
            # conv(cat(in_a, in_b), w) == conv(in_a, w[:128]) +
            # conv(in_b, w[128:]) — exact by linearity in input channels.
            # Mosaic rejects the concatenate when the operands carry
            # different slice offsets ('result/input offset mismatch on
            # non-concat dimension', found on-chip r4), so the split form
            # is the only compiled-legal spelling.
            acc = None
            for t in range(5):
                p = (jax.lax.dot_general(
                        _shift(in_a, d, t, n), w_ref[t][:128],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=_F32)
                     + jax.lax.dot_general(
                        _shift(in_b, d, t, n), w_ref[t][128:],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=_F32))
                acc = p if acc is None else acc + p
            return acc

        # zr on the widened span: values at the +-2 guard positions are
        # finite but arbitrary-w.r.t.-the-true-conv (their pre rows are
        # zero-padded); they only ever multiply h = 0 below.
        zr = (conv(hx, wzr_ref, mid) + bzr_ref[0]).astype(_BF16)
        zr = zr + pzr_ref[0]
        # transcendentals computed in f32 and rounded back (= XLA's bf16
        # elementwise semantics). Mosaic rejects them directly on bf16
        # vectors: the lowering broadcasts f32 scalar constants into the
        # bf16 vector type ('vector.broadcast f32 -> vector<...xbf16>'
        # verification error, found on-chip r4 — invisible in interpret).
        z = jax.nn.sigmoid(zr[..., :128].astype(_F32)).astype(_BF16)
        r = jax.nn.sigmoid(zr[..., 128:].astype(_F32)).astype(_BF16)
        h_mid = _shift(h, d, 2, mid)
        x_mid = _shift(x, d, 2, mid)
        rh = (r * h_mid).astype(_BF16)
        q = (conv2(rh, x_mid, wq_ref, out_span) + bq_ref[0]).astype(_BF16)
        q = jnp.tanh((q + pq_ref[0]).astype(_F32)).astype(_BF16)
        z_out = _shift(z, d, 2, out_span)
        h_out = _shift(h, d, 4, out_span)
        # mirror the XLA twin's promotion points exactly: (1-z) and z*q
        # round to bf16, the convex sum accumulates f32. The 1.0 constant
        # must be EXPLICITLY bf16 — a weak-typed scalar lowers to an f32
        # vector.broadcast that Mosaic rejects against a bf16 operand.
        one = jnp.asarray(1.0, _BF16)
        out_ref[0] = ((one - z_out).astype(_F32) * h_out
                      + (z_out * q).astype(_F32))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("axis", "tile", "interpret"))
def fused_gru_update(h, x, pre_zr, pre_q, wzr, wq, bzr, bq, axis,
                     tile=8, interpret=False):
    """One fused gated update along `axis` ('w' = 1x5, 'h' = 5x1).

    Args (caller pads; see `sep_conv_gru_pallas`):
        h: (1, H, W, 128) f32 carry, padded +4 zeros per side along axis,
            and padded along the OTHER axis to a multiple of `tile`.
        x: like h, bf16 (motion features).
        pre_zr: (1, ., ., 256) bf16 context contribution to [z|r], padded
            +2 zeros per side along axis (+ tile-rounded other axis).
        pre_q: (1, ., ., 128) bf16, unpadded along axis.
        wzr: (5, 256, 128+128) bf16 taps over cat(h, x) for [z|r].
        wq: (5, 256, 128) bf16 taps over cat(r*h, x).
        bzr, bq: (1, 256)/(1, 128) f32 biases.
    Returns:
        (1, H_out, W_out, 128) f32 updated carry, where the axis dim is
        8 shorter than h's and the other dim matches h's (tile-rounded —
        caller slices).
    """
    _, H, W, _ = h.shape
    if axis == "w":
        out_h, out_w = H, W - 8
        d = 1
        grid = (H // tile,)
        bh = (1, tile, W, 128)
        bzr_blk = (1, tile, W - 4, 256)
        bq_blk = (1, tile, out_w, 128)
        bout = (1, tile, out_w, 128)
        idx = lambda i: (i, 0, 0)  # noqa: E731
        span, out_span = W, out_w
    else:
        out_h, out_w = H - 8, W
        d = 0
        grid = (W // tile,)
        bh = (1, H, tile, 128)
        bzr_blk = (1, H - 4, tile, 256)
        bq_blk = (1, out_h, tile, 128)
        bout = (1, out_h, tile, 128)
        idx = lambda i: (0, i, 0)  # noqa: E731
        span, out_span = H, out_h

    def bs(blk):
        return pl.BlockSpec((1,) + blk[1:],
                            lambda i: (0,) + idx(i),
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(wzr.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    wqspec = pl.BlockSpec(wq.shape, lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    bqspec = pl.BlockSpec((1, 128), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(d, span, out_span),
        grid=grid,
        in_specs=[bs(bh), bs(bh), bs(bzr_blk), bs(bq_blk),
                  wspec, wqspec, bspec, bqspec],
        out_specs=bs(bout),
        out_shape=jax.ShapeDtypeStruct((1, out_h, out_w, 128), _F32),
        interpret=interpret,
    )(h, x, pre_zr, pre_q, wzr, wq, bzr, bq)


def _round_up(n, m):
    return (n + m - 1) // m * m


def _pad_to(a, dim, lo, hi):
    pads = [(0, 0)] * a.ndim
    pads[dim] = (lo, hi)
    return jnp.pad(a, pads) if (lo or hi) else a


def _prep_weights(p, names, hd, xd):
    """Stack the 5 taps of the hm-rows (context-dropped) kernels."""
    ws = []
    for n in names:
        w = p[n]["weight"]                     # (1,5,C,Co) or (5,1,C,Co)
        w = w.reshape(5, w.shape[2], w.shape[3])
        ws.append(jnp.concatenate([w[:, :hd], w[:, -xd:]], axis=1))
    if len(ws) == 2:                           # fuse [z|r] output channels
        return jnp.concatenate(ws, axis=-1).astype(_BF16)
    return ws[0].astype(_BF16)


def sep_conv_gru_pallas(p, h, x, pre, interpret=False,
                        tile_w=8, tile_h=16):
    """Drop-in twin of models/raft._sep_conv_gru (bf16 mode, pre given).

    p: the GRU param dict (convz1/r1/q1 1x5, convz2/r2/q2 5x1).
    h: (1, H, W, 128) f32; x: (1, H, W, 128) motion features;
    pre: {'d1': (zr_pre, q_pre), 'd2': ...} from precompute_gru_context.
    """
    _, H, W, hd = h.shape
    xd = x.shape[-1]
    x = x.astype(_BF16)

    wzr1 = _prep_weights(p, ("convz1", "convr1"), hd, xd)
    wq1 = _prep_weights(p, ("convq1",), hd, xd)
    wzr2 = _prep_weights(p, ("convz2", "convr2"), hd, xd)
    wq2 = _prep_weights(p, ("convq2",), hd, xd)
    bzr1 = jnp.concatenate([p["convz1"]["bias"],
                            p["convr1"]["bias"]])[None].astype(_F32)
    bq1 = p["convq1"]["bias"][None].astype(_F32)
    bzr2 = jnp.concatenate([p["convz2"]["bias"],
                            p["convr2"]["bias"]])[None].astype(_F32)
    bq2 = p["convq2"]["bias"][None].astype(_F32)

    # --- d1: 1x5 along W, tiled over rows ---
    Hp = _round_up(H, tile_w)
    zr1p, q1p = pre["d1"]
    h1 = fused_gru_update(
        _pad_to(_pad_to(h, 1, 0, Hp - H), 2, 4, 4),
        _pad_to(_pad_to(x, 1, 0, Hp - H), 2, 4, 4),
        _pad_to(_pad_to(zr1p.astype(_BF16), 1, 0, Hp - H), 2, 2, 2),
        _pad_to(q1p.astype(_BF16), 1, 0, Hp - H),
        wzr1, wq1, bzr1, bq1, axis="w", tile=tile_w,
        interpret=interpret)[:, :H]

    # --- d2: 5x1 along H, tiled over cols ---
    Wp = _round_up(W, tile_h)
    zr2p, q2p = pre["d2"]
    h2 = fused_gru_update(
        _pad_to(_pad_to(h1, 2, 0, Wp - W), 1, 4, 4),
        _pad_to(_pad_to(x, 2, 0, Wp - W), 1, 4, 4),
        _pad_to(_pad_to(zr2p.astype(_BF16), 2, 0, Wp - W), 1, 2, 2),
        _pad_to(q2p.astype(_BF16), 2, 0, Wp - W),
        wzr2, wq2, bzr2, bq2, axis="h", tile=tile_h,
        interpret=interpret)[:, :, :W]
    return h2
