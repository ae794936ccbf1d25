"""Fused update-block tail kernels: motion-encoder 3x3 stack + flow head.

After the lookup (ops/pallas/local_lookup.py) and SepConvGRU
(ops/pallas/gru.py) kernels, the remaining per-iteration XLA work in the
RAFT refinement loop is a chain of 3x3 convolutions
(ref:pytracking/external/RAFT/raft_core/update.py:79-97,5-13):

    motion encoder:  cor2 = relu(convc2(cor1))      3x3 256->192
                     flo2 = relu(convf2(flo1))      3x3 128->64
                     out  = relu(conv(cat(cor2, flo2)))  3x3 256->126
    flow head:       delta = conv2(relu(conv1(net)))    3x3 128->256->2

Measured on v5e @1080p (r3 xprof), these run as separate conv fusions at
single-digit MFU (~2.45 + 0.62 + 1.23 + 2.46 ms/frame): each stage
round-trips a (135, 240, C) activation through HBM, and XLA's conv
lowering leaves the MXU idle between stages. Fused, each chain is one
VMEM-resident pass per row tile: every 3x3 conv is 9 shifted
(rows*cols, Cin) @ (Cin, Co) MXU matmuls accumulated in f32, with the
stage handoffs never leaving VMEM.

Tiling: the grid walks row bands of T output rows. Chained 3x3 convs
need a 2-row halo, which plain BlockSpecs cannot express (blocks would
overlap), so inputs stay in HBM and each grid step DMAs its
(T + 4)-row window — row offsets live on the untiled dim, so arbitrary
dynamic starts are legal (same pattern as local_lookup's fine window).
Column halos are static zero guards baked into the padded inputs (as in
ops/pallas/gru.py).

Numerics mirror the XLA bf16 path's rounding points exactly: bf16
operands, f32 MXU accumulation, f32 bias add, round to bf16, relu.
Tap-order accumulation differs from XLA's conv lowering, so outputs are
bf16 round-boundary close, not bit-equal — tests use the same f32-oracle
criterion as the GRU kernel. bf16 mode only; the XLA path remains the
parity reference.

The 7x7 convf1 (2 input channels) is deliberately NOT fused: a K=2
contraction wastes the MXU in-kernel, and XLA's conv runs it in 0.69 ms.

`conv` in the motion encoder reads cat(cor2, flo2); the kernel splits it
into two partial convolutions over the un-concatenated operands (exact:
a conv is linear in input channels, one shared f32 accumulator + one
bias). The final 126-channel output is emitted zero-padded to 128 lanes
(two zero weight columns); the caller overwrites the pad lanes with the
raw flow channels (the reference's cat(out, flow), update.py:96).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BF16 = jnp.bfloat16
_F32 = jnp.float32


# numpy (ml_dtypes) scalar: non-weak bf16 zero without touching the
# backend at import time
import numpy as _np  # noqa: E402
_ZERO_BF16 = _np.zeros((), _np.dtype(_BF16))[()]


def _round_up(n, m):
    return (n + m - 1) // m * m


def _pad2d(a, row_lo, row_hi, col_lo, col_hi):
    return jnp.pad(a, ((0, 0), (row_lo, row_hi), (col_lo, col_hi), (0, 0)))


def _taps(w):
    """(3, 3, Cin, Co) -> (9, Cin, Co) bf16 tap stack."""
    return w.reshape(9, w.shape[2], w.shape[3]).astype(_BF16)


def _conv3(inp, w_ref, b_ref, rows, cols):
    """relu(bf16(3x3 conv + bias)) over a VMEM block.

    inp: (rows + 2, cols + 2, Cin) bf16 (1-px zero/halo guard each side).
    Returns (rows, cols, Co) bf16 — XLA rounding points (f32 accumulate,
    f32 bias, bf16 round, relu)."""
    acc = _conv3_acc(inp, w_ref, rows, cols)
    # relu/select constants must be EXPLICITLY bf16: weak-typed scalars
    # lower to f32 vector.broadcasts that Mosaic rejects against bf16
    # operands (on-chip r4 finding in the GRU kernel, same class)
    return jnp.maximum((acc + b_ref[0]).astype(_BF16), _ZERO_BF16)


def _conv3_acc(inp, w_ref, rows, cols):
    """f32 accumulator of the 9 shifted-tap matmuls (no bias/cast)."""
    acc = None
    for ky in range(3):
        for kx in range(3):
            part = jax.lax.dot_general(
                inp[ky:ky + rows, kx:kx + cols, :], w_ref[ky * 3 + kx],
                (((2,), (0,)), ((), ())), preferred_element_type=_F32)
            acc = part if acc is None else acc + part
    return acc


def _stage1_mask(T, W, H, r0):
    """Zero-mask for stage-1 halo values that fall OUTSIDE the image.

    The second conv's zero padding applies to the stage-1 ACTIVATIONS:
    the XLA path pads cor2/flo2 (or the flow head's hidden) with zeros at
    image borders, but the kernel computes those positions from
    zero-guarded inputs, yielding relu(bias)-like values — they must be
    zeroed before the second conv. Block row j = image row r0 - 1 + j,
    block col j = image col j - 1.

    Returned as an f32 0/1 multiplier with an explicit minor dim: Mosaic
    only supports non-trivial minor-dim inserts/broadcasts for 32-bit
    types (an i1 ok[:, :, None] fails compiled verification, found
    on-chip r4), and x * mask is exact for a 0/1 mask."""
    rows = (jax.lax.broadcasted_iota(jnp.int32, (T + 2, W + 2, 1), 0)
            + (r0 - 1))
    cols = jax.lax.broadcasted_iota(jnp.int32, (T + 2, W + 2, 1), 1) - 1
    ok = ((rows >= 0) & (rows <= H - 1) & (cols >= 0) & (cols <= W - 1))
    return ok.astype(_F32)


def _make_me_kernel(T, W, H):
    """Motion-encoder tail over one T-row band.

    cor1/flo1 windows carry a 2-row/2-col guard (conv chain depth 2)."""

    def kernel(cor1_hbm, flo1_hbm, wc2_ref, bc2_ref, wf2_ref, bf2_ref,
               wcvA_ref, wcvB_ref, bcv_ref, out_ref, cbuf, fbuf, sem):
        i = pl.program_id(0)
        r0 = i * T
        cp_c = pltpu.make_async_copy(
            cor1_hbm.at[0, pl.ds(r0, T + 4)], cbuf, sem.at[0])
        cp_f = pltpu.make_async_copy(
            flo1_hbm.at[0, pl.ds(r0, T + 4)], fbuf, sem.at[1])
        cp_c.start()
        cp_f.start()
        cp_c.wait()
        cp_f.wait()

        # stage 1: one extra row/col each side stays for the final conv;
        # positions outside the image zero out (= the final conv's padding)
        okf = _stage1_mask(T, W, H, r0)
        cor2 = (_conv3(cbuf, wc2_ref, bc2_ref, T + 2, W + 2)
                .astype(_F32) * okf).astype(_BF16)
        flo2 = (_conv3(fbuf, wf2_ref, bf2_ref, T + 2, W + 2)
                .astype(_F32) * okf).astype(_BF16)
        # stage 2: conv(cat(cor2, flo2)) as two partial convs, one f32
        # accumulator (exact by linearity in input channels)
        acc = (_conv3_acc(cor2, wcvA_ref, T, W)
               + _conv3_acc(flo2, wcvB_ref, T, W))
        out_ref[0] = jnp.maximum((acc + bcv_ref[0]).astype(_BF16),
                                 _ZERO_BF16)

    return kernel


def _me_vmem_bytes(T, W):
    """Upper-bound VMEM footprint of one motion-encoder band step."""
    W4 = _round_up(W + 4, 8)
    bufs = (T + 4) * W4 * (256 + 128) * 2            # DMA'd bf16 bands
    stage1 = (T + 2) * (W + 2) * (192 + 64) * 4 * 2  # f32 accs + masked
    stage2 = T * W * 128 * 4                         # f32 acc
    out = T * W * 128 * 2 * 2                        # bf16 block, 2 bufs
    # taps (double-buffered) + compiler slack, calibrated so the estimate
    # reproduces the measured 16.70M at T=8, W=240 (on-chip r4 OOM)
    weights = 7300 * 2 ** 10
    return bufs + stage1 + stage2 + out + weights


def _pick_tile(W, est, budget=14 * 2 ** 20, cands=(16, 8, 4, 2)):
    """Largest band height whose estimated VMEM stays under budget.

    The v5e scoped-vmem stack limit is 16 MB; tile=8 fits the 1080p loop
    width (240) but OOMs by ~0.7 MB once the r4 8-aligned DMA padding
    lands, and 4K widths need smaller bands still (found on-chip r4)."""
    for t in cands:
        if est(t, W) <= budget:
            return t
    return cands[-1]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def motion_encoder_pallas(p, flow, cor1, flo1, tile=None, interpret=False):
    """Fused twin of the 3x3 stack of models/raft._basic_motion_encoder.

    Args:
        p: the motion-encoder param dict (convc2, convf2, conv; convc1 and
            convf1 are consumed by the caller).
        flow: (1, H, W, 2) f32 current flow (cat'd into the output).
        cor1: (1, H, W, 256) relu(convc1(corr)) activations.
        flo1: (1, H, W, 128) relu(convf1(flow)) activations.
    Returns:
        (1, H, W, 128) bf16 motion features = cat(out126, flow).

    tile=8 default: ~7 MB VMEM/step at the 1080p loop shape (240 cols);
    tile=16 (~12 MB) trades 1.25x less stage-1 halo recompute against
    VMEM headroom — revisit with on-chip numbers (tools/update_ab.py).
    """
    _, H, W, _ = cor1.shape
    T = tile if tile is not None else _pick_tile(W, _me_vmem_bytes)
    Hp = _round_up(H, T)
    n = Hp // T

    # DMA'd band slices must be 8-aligned on the second-minor dim (Mosaic
    # rule, found on-chip r4): round the buffered width W+4 up to x8 with
    # extra zero columns (never read past W+4 by the conv windows)
    W4 = _round_up(W + 4, 8)
    cor1p = _pad2d(cor1.astype(_BF16), 2, Hp - H + 2, 2, W4 - W - 2)
    flo1p = _pad2d(flo1.astype(_BF16), 2, Hp - H + 2, 2, W4 - W - 2)

    wc2 = _taps(p["convc2"]["weight"])                     # (9, 256, 192)
    bc2 = p["convc2"]["bias"][None].astype(_F32)
    wf2 = _taps(p["convf2"]["weight"])                     # (9, 128, 64)
    bf2 = p["convf2"]["bias"][None].astype(_F32)
    wcv = p["conv"]["weight"]                              # (3,3,256,126)
    co = wcv.shape[-1]
    wcv = jnp.pad(wcv, ((0, 0),) * 3 + ((0, 128 - co),))   # zero pad lanes
    ci_c = p["convc2"]["weight"].shape[-1]                 # 192
    wcvA = _taps(wcv[:, :, :ci_c])                         # cor2 rows
    wcvB = _taps(wcv[:, :, ci_c:])                         # flo2 rows
    bcv = jnp.pad(p["conv"]["bias"], (0, 128 - co))[None].astype(_F32)

    def wspec(w):
        return pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_me_kernel(T, W, H),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            wspec(wc2), wspec(bc2), wspec(wf2), wspec(bf2),
            wspec(wcvA), wspec(wcvB), wspec(bcv),
        ],
        out_specs=pl.BlockSpec((1, T, W, 128), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Hp, W, 128), _BF16),
        scratch_shapes=[
            pltpu.VMEM((T + 4, W4, cor1.shape[-1]), _BF16),
            pltpu.VMEM((T + 4, W4, flo1.shape[-1]), _BF16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(cor1p, flo1p, wc2, bc2, wf2, bf2, wcvA, wcvB, bcv)
    out = out[:, :H]
    # lanes 126-127 are zero by construction: cat(out126, flow) lands as a
    # cheap lane overwrite outside the kernel (XLA fuses the concat)
    return jnp.concatenate([out[..., :co], flow.astype(_BF16)], axis=-1)


def _make_fh_kernel(T, W, H):
    def kernel(net_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, nbuf,
               sem):
        i = pl.program_id(0)
        r0 = i * T
        cp = pltpu.make_async_copy(
            net_hbm.at[0, pl.ds(r0, T + 4)], nbuf, sem)
        cp.start()
        cp.wait()
        okf = _stage1_mask(T, W, H, r0)
        h = (_conv3(nbuf, w1_ref, b1_ref, T + 2, W + 2)
             .astype(_F32) * okf).astype(_BF16)
        acc = _conv3_acc(h, w2_ref, T, W)                  # 256 -> 2 (pad)
        out_ref[0] = acc + b2_ref[0]                       # delta stays f32

    return kernel


def _fh_vmem_bytes(T, W):
    """Upper-bound VMEM footprint of one flow-head band step."""
    W4 = _round_up(W + 4, 8)
    buf = (T + 4) * W4 * 128 * 2                     # DMA'd bf16 band
    stage1 = (T + 2) * (W + 2) * 256 * 4 * 2         # f32 acc + masked
    stage2 = T * W * 128 * 4                         # f32 acc
    out = T * W * 128 * 4 * 2                        # f32 block, 2 bufs
    weights = 4500 * 2 ** 10                         # taps + slack
    return buf + stage1 + stage2 + out + weights


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def flow_head_pallas(p, net, tile=None, interpret=False):
    """Fused twin of models/raft._flow_head in bf16 mode.

    net: (1, H, W, 128) GRU state. Returns (1, H, W, 2) f32 delta flow —
    f32 like the XLA path (flow precision is never bf16-rounded). The
    2-channel result is computed into 128 zero-padded lanes (128-lane
    stores; the caller's slice is free) — a (.., 2)-lane output block is
    the follow-up experiment if stores ever dominate."""
    _, H, W, _ = net.shape
    T = tile if tile is not None else _pick_tile(W, _fh_vmem_bytes,
                                                 cands=(16, 8, 4, 2))
    Hp = _round_up(H, T)
    n = Hp // T

    W4 = _round_up(W + 4, 8)        # 8-aligned DMA width (see motion enc.)
    netp = _pad2d(net.astype(_BF16), 2, Hp - H + 2, 2, W4 - W - 2)
    w1 = _taps(p["conv1"]["weight"])                       # (9, 128, 256)
    b1 = p["conv1"]["bias"][None].astype(_F32)
    w2 = p["conv2"]["weight"]                              # (3, 3, 256, 2)
    co = w2.shape[-1]
    w2 = _taps(jnp.pad(w2, ((0, 0),) * 3 + ((0, 128 - co),)))
    b2 = jnp.pad(p["conv2"]["bias"], (0, 128 - co))[None].astype(_F32)

    def wspec(w):
        return pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_fh_kernel(T, W, H),
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  wspec(w1), wspec(b1), wspec(w2), wspec(b2)],
        out_specs=pl.BlockSpec((1, T, W, 128), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Hp, W, 128), _F32),
        scratch_shapes=[
            pltpu.VMEM((T + 4, W4, net.shape[-1]), _BF16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(netp, w1, b1, w2, b2)
    return out[:, :H, :, :co]
