"""RAFT and WeightedRAFT as functional JAX models (NHWC, lax.scan GRU).

TPU-native rework of ref:raft_core/raft.py, ref:raft_core/weighted_raft.py,
ref:raft_core/update.py, ref:raft_core/extractor.py. Parameters are nested
dicts keyed like the torch checkpoints (see models/layers.py) so the ``.pth``
converter is a pure transpose pass; the forward path is pure-functional and
jit/vmap/scan-friendly:

- encoders run both frames as one 2B batch (instance norm is per-sample,
  batch norm uses running stats -> no cross-talk),
- the 12 GRU refinement iterations are one ``lax.scan`` with the up-mask
  carried (only the final one is needed in test mode),
- convex upsampling is an einsum over 3x3 flow patches and softmaxed 8x8
  sub-pixel weights (exact twin of ref:weighted_raft.py:92-103),
- the weight head consumes the final correlation lookup reshaped with the
  reference's channel arithmetic (ref:weighted_raft.py:266-279) plus the
  mean cost-volume response.

Everything per-frame-pair; batch dim carries multiple targets/streams.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.warp import coords_grid, grid_sample, upflow8
from . import layers
from .corr import corr_lookup


@dataclass(frozen=True)
class RaftConfig:
    """Static model configuration (hashable -> usable as a jit static arg).

    Mirrors the reference args (ref:weighted_raft.py:30-76)."""
    small: bool = False
    variant: str = "weighted"          # 'orig' | 'weighted' | 'weighted_masked'
    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 0               # 0 = auto: 3 (small) / 4 (basic)
    weight_head_structure: Tuple = ((128, 3), (128, 3), (128, 3))
    mask_head_structure: Tuple = ()
    corr_impl: str = "onehot"          # 'onehot' | 'gather' | 'rowgather'
                                       # | 'dslice' | 'band' | 'pallas'
                                       # | 'local' (block-shared recentered
                                       # windows — the production big-frame
                                       # impl, configs/WOFT_fast.py)
    alternate_corr: bool = False       # on-the-fly windowed correlation:
                                       # no materialized volume (huge frames)
    alt_chunk: int = 4096              # queries per alternate-corr map step
    local_margin: int = 16             # corr_impl='local': exact-lookup
                                       # half-range in 1/8-res cells
                                       # (16 -> +-128 full-res px residual)
    local_pallas: Optional[bool] = None  # corr_impl='local': Pallas
                                       # construction+lookup kernels with
                                       # query-minor volumes (None = auto:
                                       # on for non-CPU backends)
    gru_pallas: Optional[bool] = None  # fused SepConvGRU kernels in the
                                       # iteration loop (ops/pallas/gru.py;
                                       # bf16 mode + B=1 only; None/False =
                                       # off — on-chip correct but SLOWER
                                       # in-graph than XLA (r4 measured:
                                       # 12.0 vs 14.6 fps @1080p), opt-in
    tail_pallas: Optional[bool] = None  # fused flow-head kernel in the loop
                                        # (ops/pallas/update_tail.py; same
                                        # gating as gru_pallas; opt-in —
                                        # on-chip correct but SLOWER
                                        # in-graph than XLA at both window
                                        # and full-frame scales (r4: 9.71 vs
                                        # 14.85 fps @1080p full; the fused
                                        # motion encoder likewise lost
                                        # in-graph, 1.95 vs 0.99 ms, and is
                                        # pinned to XLA — see RESULTS.md r4
                                        # kernel A/B ladder)
    fine_check: bool = True            # corr_impl='local' fine lookups:
                                       # analytic spread guard with exact
                                       # full-slab lax.cond fallback (see
                                       # corr.corr_lookup_local_blocked)
    precision: str = "highest"         # 'highest' | 'default' | 'bf16'

    @property
    def hidden_dim(self):
        return 96 if self.small else 128

    @property
    def context_dim(self):
        return 64 if self.small else 128

    @property
    def fnet_dim(self):
        return 128 if self.small else 256

    @property
    def radius(self):
        if self.corr_radius:
            return self.corr_radius
        return 3 if self.small else 4

    @property
    def lax_precision(self):
        return jax.lax.Precision(
            {"highest": "highest", "default": "default", "high": "high",
             "bf16": "default"}[self.precision])

    @property
    def compute_dtype(self):
        # 'bf16': cast conv inputs/kernels to bf16 (f32 accumulation)
        return jnp.bfloat16 if self.precision == "bf16" else None


# ---------------------------------------------------------------------------
# encoders (ref:raft_core/extractor.py)
# ---------------------------------------------------------------------------

def _residual_block(p, x, norm_fn, stride, sd=None):
    """ref:extractor.py:6-56. ``sd``: activation storage dtype (bf16 mode
    stores encoder activations bf16 — f32 accumulation everywhere; halves
    the HBM traffic that dominates encoder cost at 1080p)."""
    planes = p["conv1"]["weight"].shape[-1]
    ng = planes // 8
    y = layers.relu(layers.apply_norm(p.get("norm1", {}),
                                      layers.conv2d(p["conv1"], x,
                                                    out_dtype=sd,
                                                    stride=stride, padding=1),
                                      norm_fn, ng))
    y = layers.relu(layers.apply_norm(p.get("norm2", {}),
                                      layers.conv2d(p["conv2"], y, padding=1,
                                                    out_dtype=sd),
                                      norm_fn, ng))
    if stride != 1:
        ds = p["downsample"]
        x = layers.apply_norm(ds.get("1", {}),
                              layers.conv2d(ds["0"], x, stride=stride,
                                            out_dtype=sd),
                              norm_fn, ng)
    return layers.relu(x + y)


def _bottleneck_block(p, x, norm_fn, stride, sd=None):
    """ref:extractor.py:60-116."""
    planes = p["conv3"]["weight"].shape[-1]
    ng = planes // 8
    y = layers.relu(layers.apply_norm(p.get("norm1", {}),
                                      layers.conv2d(p["conv1"], x,
                                                    out_dtype=sd),
                                      norm_fn, ng))
    y = layers.relu(layers.apply_norm(p.get("norm2", {}),
                                      layers.conv2d(p["conv2"], y,
                                                    stride=stride, padding=1,
                                                    out_dtype=sd),
                                      norm_fn, ng))
    y = layers.relu(layers.apply_norm(p.get("norm3", {}),
                                      layers.conv2d(p["conv3"], y,
                                                    out_dtype=sd),
                                      norm_fn, ng))
    if stride != 1:
        ds = p["downsample"]
        x = layers.apply_norm(ds.get("1", {}),
                              layers.conv2d(ds["0"], x, stride=stride,
                                            out_dtype=sd),
                              norm_fn, ng)
    return layers.relu(x + y)


def encoder_apply(p, x, norm_fn, small=False):
    """BasicEncoder / SmallEncoder forward (eval mode, no dropout).

    x: (N, H, W, 3) in [-1, 1] -> (N, H/8, W/8, output_dim)."""
    block = _bottleneck_block if small else _residual_block
    first_ch = 32 if small else 64
    sd = layers.get_compute_dtype()      # bf16 activation storage in bf16 mode
    x = layers.conv2d(p["conv1"], x, stride=2, padding=3, out_dtype=sd)
    x = layers.apply_norm(p.get("norm1", {}), x, norm_fn, 8 if norm_fn == "group" else first_ch)
    x = layers.relu(x)
    for layer_name, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        lp = p[layer_name]
        x = block(lp["0"], x, norm_fn, stride, sd)
        x = block(lp["1"], x, norm_fn, 1, sd)
    return layers.conv2d(p["conv2"], x)


# ---------------------------------------------------------------------------
# update block (ref:raft_core/update.py)
# ---------------------------------------------------------------------------

def _flow_head(p, x, pallas=False):
    if pallas:
        from ..ops.pallas.update_tail import flow_head_pallas
        return flow_head_pallas(p, x)
    h = layers.relu(layers.conv2d(p["conv1"], x, padding=1,
                                  out_dtype=layers.get_compute_dtype()))
    return layers.conv2d(p["conv2"], h, padding=1)   # delta stays f32


def _corr_conv1(pc, corr):
    """relu(convc1(corr)) accepting natural (B,H,W,C) or BlockedCorr.

    The Pallas slab lookup emits (NB, L*k*k, BQ) with channels in
    (level, j, i) order (see ops/pallas/local_lookup.py). convc1 is the
    sole consumer of the raw corr channels and is a pure channel
    reduction, so BOTH the query-major relayout and the (j, i) -> (i, j)
    order swap fold into this matmul for free: the weight rows are
    view-permuted (exact — each output channel is an independent sum) and
    the contraction runs with queries as the M dim. Only the 128-ch
    output gets re-laid to spatial NHWC (same relayout the natural path
    pays), never the 324-ch lookup tensor x 12 iterations."""
    from .corr import BlockedCorr, _from_blocked

    if not isinstance(corr, BlockedCorr):
        return layers.relu(layers.conv2d(pc, corr))
    w = pc["weight"][0, 0]                                 # (L*k*k, Co)
    L, k = corr.levels, corr.k
    co = w.shape[-1]
    wv = (w.reshape(L, k, k, co).transpose(0, 2, 1, 3)     # torch (l,i,j)
          .reshape(L * k * k, co))                         # -> kernel (l,j,i)
    data = corr.data                                       # (NB, C, BQ) f32
    cd = layers.get_compute_dtype()
    if cd is not None:
        data = data.astype(cd)
        wv = wv.astype(cd)
    out = jnp.einsum("bcq,co->bqo", data, wv,
                     precision=layers.get_precision(),
                     preferred_element_type=jnp.float32)
    out = out + pc["bias"].astype(out.dtype)
    if cd is not None:
        # cast BEFORE the blocked->natural relayout so the transpose
        # moves half the bytes (runs 12x per frame in the GRU loop)
        out = out.astype(cd)
    nb, _, bq = corr.data.shape
    out = _from_blocked(out.reshape(nb * bq, co), corr.meta)
    meta = corr.meta
    return layers.relu(out.reshape(1, meta["H1"], meta["W1"], co))


def _basic_motion_encoder(p, flow, corr, pallas=False):
    """ref:update.py:79-97. Intermediates store in the compute dtype in
    bf16 mode (f32 accumulation in every conv; see layers.conv2d).

    ``pallas``: run the 3x3 stack (convc2 + convf2 + conv(cat)) as one
    fused VMEM-resident kernel (ops/pallas/update_tail.py; bf16 mode
    only). convc1 (channel-reduction einsum absorbing the blocked-lookup
    relayout) and the MXU-hostile 7x7 2-channel convf1 stay XLA."""
    sd = layers.get_compute_dtype()
    cor = _corr_conv1(p["convc1"], corr)
    flo = layers.relu(layers.conv2d(p["convf1"], flow, padding=3,
                                    out_dtype=sd))
    if pallas:
        from ..ops.pallas.update_tail import motion_encoder_pallas
        return motion_encoder_pallas(p, flow, cor, flo)
    cor = layers.relu(layers.conv2d(p["convc2"], cor, padding=1,
                                    out_dtype=sd))
    flo = layers.relu(layers.conv2d(p["convf2"], flo, padding=1,
                                    out_dtype=sd))
    out = layers.relu(layers.conv2d(p["conv"],
                                    jnp.concatenate([cor, flo], -1),
                                    padding=1, out_dtype=sd))
    return jnp.concatenate([out, flow.astype(out.dtype)], -1)


def _small_motion_encoder(p, flow, corr):
    """ref:update.py:62-77."""
    sd = layers.get_compute_dtype()
    cor = _corr_conv1(p["convc1"], corr)
    flo = layers.relu(layers.conv2d(p["convf1"], flow, padding=3,
                                    out_dtype=sd))
    flo = layers.relu(layers.conv2d(p["convf2"], flo, padding=1,
                                    out_dtype=sd))
    out = layers.relu(layers.conv2d(p["conv"],
                                    jnp.concatenate([cor, flo], -1),
                                    padding=1, out_dtype=sd))
    return jnp.concatenate([out, flow.astype(out.dtype)], -1)


def _gru_gates(pz, pr, pq, h, x, pad, pre=None):
    """One gated update. ``x`` is the varying input (motion features, or
    cat(inp, motion) when ``pre`` is None).

    ``pre``: optional (zr_pre, q_pre) — the context (`inp`) channels'
    contribution to the zr and q convolutions, precomputed ONCE per frame
    (`precompute_gru_context`). `inp` never changes across GRU iterations,
    and a convolution is linear in its input channels, so splitting
    conv([h, inp, motion]) = conv_hm([h, motion]) + conv_inp(inp) is exact
    and removes a third of the recurrent convs' FLOPs from the 12x loop."""
    sd = layers.get_compute_dtype()
    hx = jnp.concatenate([h.astype(x.dtype) if sd is not None else h, x],
                         -1)
    # z and r read the same input: run them as ONE conv with concatenated
    # output channels (numerically identical per-channel — each output
    # channel is an independent reduction; halves the GRU's kernel count
    # and doubles the matmul N for better MXU tiling)
    hd = h.shape[-1]
    xd = x.shape[-1]
    if pre is None:
        wz, wr, wq = pz["weight"], pr["weight"], pq["weight"]
    else:
        # drop the inp rows: their contribution arrives via `pre`
        def hm_rows(w):
            return jnp.concatenate([w[:, :, :hd], w[:, :, -xd:]], axis=2)
        wz, wr, wq = (hm_rows(pz["weight"]), hm_rows(pr["weight"]),
                      hm_rows(pq["weight"]))
    zr = layers.conv2d(
        {"weight": jnp.concatenate([wz, wr], axis=-1),
         "bias": jnp.concatenate([pz["bias"], pr["bias"]], axis=-1)},
        hx, padding=pad, out_dtype=sd)
    if pre is not None:
        zr = zr + pre[0].astype(zr.dtype)
    C = pz["weight"].shape[-1]
    z = jax.nn.sigmoid(zr[..., :C])
    r = jax.nn.sigmoid(zr[..., C:])
    q = layers.conv2d({"weight": wq, "bias": pq["bias"]},
                      jnp.concatenate([(r * h).astype(hx.dtype), x], -1),
                      padding=pad, out_dtype=sd)
    if pre is not None:
        q = q + pre[1].astype(q.dtype)
    q = jnp.tanh(q)
    # the recurrent state stays f32: z/q gate values are bf16-stored in
    # bf16 mode, but the convex combination accumulates at carry precision
    return (1 - z) * h + z * q


def _sep_conv_gru(p, h, x, pre=None, pallas=False):
    """1x5 then 5x1 gated updates (ref:update.py:33-60).

    ``pallas=True`` (requires ``pre`` and bf16 compute mode): run each
    direction as one fused Pallas kernel — zr conv, gates, q conv and the
    convex blend in a single VMEM-resident pass (ops/pallas/gru.py). Same
    operand dtypes and rounding points as this XLA path."""
    if pallas:
        assert pre is not None, "fused GRU kernel needs hoisted context"
        from ..ops.pallas.gru import sep_conv_gru_pallas
        return sep_conv_gru_pallas(p, h, x, pre)
    h = _gru_gates(p["convz1"], p["convr1"], p["convq1"], h, x, (0, 2),
                   None if pre is None else pre["d1"])
    h = _gru_gates(p["convz2"], p["convr2"], p["convq2"], h, x, (2, 0),
                   None if pre is None else pre["d2"])
    return h


def precompute_gru_context(p, inp, hd):
    """Per-frame loop-invariant context contributions to the SepConvGRU.

    Returns {'d1': (zr_pre, q_pre), 'd2': ...} maps, each the convolution
    of `inp` against the context rows of the corresponding gate kernels
    (bias-free; biases stay on the recurrent half). See _gru_gates."""
    ci = inp.shape[-1]

    def ctx(w):
        return w[:, :, hd:hd + ci]

    out = {}
    for name, kz, kr, kq, pad in (("d1", "convz1", "convr1", "convq1",
                                   (0, 2)),
                                  ("d2", "convz2", "convr2", "convq2",
                                   (2, 0))):
        sd = layers.get_compute_dtype()
        wzr = jnp.concatenate([ctx(p[kz]["weight"]),
                               ctx(p[kr]["weight"])], axis=-1)
        zr_pre = layers.conv2d({"weight": wzr}, inp, padding=pad,
                               out_dtype=sd)
        q_pre = layers.conv2d({"weight": ctx(p[kq]["weight"])}, inp,
                              padding=pad, out_dtype=sd)
        out[name] = (zr_pre, q_pre)
    return out


def _conv_gru(p, h, x):
    """3x3 ConvGRU (ref:update.py:16-31)."""
    return _gru_gates(p["convz"], p["convr"], p["convq"], h, x, 1)


def update_block_apply(p, net, inp, corr, flow, small=False, pre=None,
                       with_mask=True, gru_pallas=False, tail_pallas=False):
    """-> (net, up_mask | None, delta_flow) (ref:update.py:99-136).

    ``pre``: loop-invariant context contributions from
    `precompute_gru_context` — when given, ``inp`` is NOT concatenated
    into the GRU input (its conv contribution arrives via ``pre``).
    ``with_mask=False`` skips the convex-upsample mask convs; the final
    mask is recoverable from the returned ``net`` via `mask_from_net`
    (only the LAST iteration's mask is ever consumed downstream, so
    running these convs inside the 12x loop is pure waste)."""
    if small:
        motion = _small_motion_encoder(p["encoder"], flow, corr)
        net = _conv_gru(p["gru"], net, jnp.concatenate([inp, motion], -1))
        delta = _flow_head(p["flow_head"], net)
        return net, None, delta
    # Motion encoder stays on the XLA path: the fused kernel LOST its
    # on-chip A/B timing (1.95 vs 0.99 ms/12-loop, tools/update_ab.py,
    # 2026-08-18 v5e) while the flow-head kernel won (4.79 vs 7.94).
    motion = _basic_motion_encoder(p["encoder"], flow, corr,
                                   pallas=False)
    if pre is None:
        net = _sep_conv_gru(p["gru"], net,
                            jnp.concatenate([inp, motion], -1))
    else:
        net = _sep_conv_gru(p["gru"], net, motion, pre,
                            pallas=gru_pallas)
    if not with_mask:
        return net, None, _flow_head(p["flow_head"], net,
                                     pallas=tail_pallas)
    # the flow head's conv1 and the mask head's conv 0 both read ``net``:
    # one fused 3x3 128->512 conv (exact, see _gru_gates note)
    fh, mh = p["flow_head"], p["mask"]
    c1 = layers.conv2d(
        {"weight": jnp.concatenate([fh["conv1"]["weight"],
                                    mh["0"]["weight"]], axis=-1),
         "bias": jnp.concatenate([fh["conv1"]["bias"],
                                  mh["0"]["bias"]], axis=-1)},
        net, padding=1, out_dtype=layers.get_compute_dtype())
    Cf = fh["conv1"]["weight"].shape[-1]
    delta = layers.conv2d(fh["conv2"], layers.relu(c1[..., :Cf]),
                          padding=1)
    mask = 0.25 * layers.conv2d(mh["2"], layers.relu(c1[..., Cf:]))
    return net, mask, delta


def mask_from_net(p, net):
    """Convex-upsample mask from a GRU state (ref:update.py:126-130).

    Bit-equal to the mask leg of `update_block_apply` at the same
    ``net`` (same convs, same 0.25 scale)."""
    mh = p["mask"]
    return 0.25 * layers.conv2d(
        mh["2"], layers.relu(layers.conv2d(mh["0"], net, padding=1)))


# ---------------------------------------------------------------------------
# convex upsampling (ref:weighted_raft.py:92-103)
# ---------------------------------------------------------------------------

def convex_upsample(flow, mask, mul=8.0):
    """Convex-combination x8 upsampling.

    flow: (B, H, W, C); mask: (B, H, W, 9*64) with channel = p*64 + fy*8 + fx
    (the torch ``view(N, 1, 9, 8, 8, H, W)`` layout). Returns (B, 8H, 8W, C).
    ``mul`` scales the values (8 for flow; callers divide by 8 for weights,
    ref:weighted_raft.py:284-290)."""
    B, H, W, C = flow.shape
    # keep the 64 subpixels in the MINOR (lane) dim through the whole
    # chain: mask (…, 9*64) splits to (…, 9, 64) as a bitcast, softmax
    # reduces over sublanes, and the contraction emits (…, 64, C).
    # Splitting 64 -> (8, 8) mid-chain instead (the old "->bhfwgc"
    # einsum) forced XLA to relayout the 75 MB softmax output and
    # materialize two more 75 MB transposes — 5.2 ms of a 1080p frame
    # for a 75 MFLOP op; this form moves ~100 MB total (same products,
    # same p-contraction order, bit-identical result).
    m = jax.nn.softmax(mask.reshape(B, H, W, 9, 64), axis=3)

    fp = jnp.pad(flow * mul, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack([fp[:, ky:ky + H, kx:kx + W, :]
                         for ky in range(3) for kx in range(3)],
                        axis=3)                                   # (B,H,W,9,C)
    up = jnp.einsum("bhwpk,bhwpc->bhwkc", m, patches,
                    precision=jax.lax.Precision.HIGHEST)          # (B,H,W,64,C)
    up = up.reshape(B, H, W, 8, 8, C).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(B, 8 * H, 8 * W, C)


# ---------------------------------------------------------------------------
# weight / mask heads (ref:weighted_raft.py:318-422)
# ---------------------------------------------------------------------------

def _head_convnet(p, x, structure):
    """Conv stack [(ch, k), ...] + ReLU each, then 1x1 conv to 1 channel.

    Param keys follow torch nn.Sequential numbering with interleaved ReLU:
    conv i lives at key str(2*i)."""
    idx = 0
    for spec in structure:
        ch, k = spec if isinstance(spec, (tuple, list)) else (spec, 3)
        x = layers.relu(layers.conv2d(p[str(idx)], x, padding=k // 2))
        idx += 2
    return layers.conv2d(p[str(idx)], x)


def weight_head_apply(p, corr_sample, mean_response, structure):
    """Flow-reliability logits from the correlation sample + mean response.

    corr_sample: (B, H1, W1, Kp, Kp, L) — the final lookup's 324 channels
      split with the reference's (H_patch, W_patch, N_levels) arithmetic
      (ref:weighted_raft.py:266-272).
    mean_response: (B, H1, W1) mean of each query's full cost-volume row.
    Returns (B, H1, W1, 1) logits (ref:weighted_raft.py:347-384)."""
    B, H1, W1, Kp, _, L = corr_sample.shape
    x = corr_sample.reshape(B * H1 * W1, Kp, Kp, L)
    mean = jnp.broadcast_to(mean_response.reshape(B * H1 * W1, 1, 1, 1),
                            (B * H1 * W1, Kp, Kp, 1))
    x = jnp.concatenate([x, mean], axis=-1)
    dense = _head_convnet(p["net"], x, structure)     # (BHW, Kp, Kp, 1)
    w = jnp.mean(dense, axis=(1, 2))                  # (BHW, 1)
    return w.reshape(B, H1, W1, 1)


def mask_head_apply(p, template_features, current_features, structure):
    """Visibility-mask logits (ref:weighted_raft.py:387-422)."""
    x = jnp.concatenate([template_features, current_features], axis=-1)
    return _head_convnet(p["net"], x, structure)


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------

def encode_template(params, cfg: RaftConfig, image1):
    """Pre-compute the frame-1 features the forward pass needs.

    The tracker's template is fixed for a whole sequence; instance norm is
    per-sample and batch norm uses running stats, so encoding it separately
    is numerically identical to the reference's joint 2B-batch encode
    (ref:weighted_raft.py:204-219) — but saves ~half the encoder FLOPs per
    tracked frame. Returns (fmap1, net0, inp)."""
    with layers.precision_scope(cfg.lax_precision, cfg.compute_dtype):
        x1 = 2.0 * (image1 / 255.0) - 1.0
        hdim, cdim = cfg.hidden_dim, cfg.context_dim
        fmap1 = encoder_apply(params["fnet"], x1, "instance", cfg.small)
        cnet = encoder_apply(params["cnet"], x1,
                             "none" if cfg.small else "batch", cfg.small)
        net = jnp.tanh(cnet[..., :hdim])
        inp = jax.nn.relu(cnet[..., hdim:hdim + cdim])
        return fmap1, net, inp


def weighted_raft_forward(params, cfg: RaftConfig, image1, image2,
                          flow_init=None, iters=None, template_feats=None,
                          sparse_weight_head=False, corr_shard=None):
    """Estimate flow (and reliability weights) between two frames.

    Args:
        params: converted/initialised parameter pytree.
        cfg: static RaftConfig.
        image1, image2: (B, H, W, 3) float RGB in [0, 255], H, W % 8 == 0.
            ``image1`` may be None when ``template_feats`` is given.
        flow_init: optional (B, H/8, W/8, 2) initial flow.
        iters: GRU iterations (defaults to cfg.iters).
        template_feats: optional (fmap1, net0, inp) from ``encode_template``.
        sparse_weight_head: skip the dense weight head (the 13th lookup +
            per-query convnet over all H1*W1 cells); instead return
            ``weight_head_at(cells)`` — a closure evaluating identical
            logits at M flat 1/8-grid cells — plus 'up_mask'. The weight
            head is per-cell independent (it convolves over the 9x9 *patch*
            dims, ref:weighted_raft.py:347-384), so evaluating it only at
            the cells the tracker's 500-point solver consumes is exact and
            ~65x cheaper at 1080p. B must be 1.
        corr_shard: optional ``(level_idx, corr_l) -> corr_l`` hook pinning
            each pyramid level's sharding (spatial scale-out: the hook
            constrains key columns to the ``sp`` mesh axis and the onehot
            lookup's window einsum psums a tiny (Q, k+1, k+1) partial —
            parallel/sharding.py::spatial_sharded_forward). Pyramid
            ``corr_impl``s only ('onehot'/'gather'/'rowgather').
    Returns:
        dict with 'flow' (B,H/8,W/8,2), 'flow_up' (B,H,W,2) and for weighted
        variants 'weights' (B,H/8,W/8,1), 'weights_up' (B,H,W,1), plus
        'mask_up' for 'weighted_masked'; 'mean_response' (B,H/8,W/8).
    (ref:weighted_raft.py:179-315)
    """
    with layers.precision_scope(cfg.lax_precision, cfg.compute_dtype):
        return _raft_forward(params, cfg, image1, image2, flow_init, iters,
                             template_feats, sparse_weight_head, corr_shard)


def _raft_forward(params, cfg, image1, image2, flow_init, iters,
                  template_feats, sparse_weight_head, corr_shard=None):
    iters = cfg.iters if iters is None else iters

    x2 = 2.0 * (image2 / 255.0) - 1.0
    B, H, W, _ = x2.shape
    H1, W1 = H // 8, W // 8
    hdim, cdim = cfg.hidden_dim, cfg.context_dim
    radius = cfg.radius

    if template_feats is not None:
        fmap1, net, inp = template_feats
        fmap2 = encoder_apply(params["fnet"], x2, "instance", cfg.small)
    else:
        x1 = 2.0 * (image1 / 255.0) - 1.0
        fmaps = encoder_apply(params["fnet"],
                              jnp.concatenate([x1, x2], axis=0),
                              "instance", cfg.small)
        fmap1, fmap2 = fmaps[:B], fmaps[B:]
        cnet = encoder_apply(params["cnet"], x1,
                             "none" if cfg.small else "batch", cfg.small)
        net = jnp.tanh(cnet[..., :hdim])
        inp = jax.nn.relu(cnet[..., hdim:hdim + cdim])

    lookup_natural = None            # set when `lookup` returns BlockedCorr
    if cfg.alternate_corr:
        # on-the-fly windowed correlation: no O(Q^2) volume in HBM
        # (ref:raft_core/corr.py:72-100 AlternateCorrBlock capability)
        from .corr import corr_lookup_alternate, corr_mean_response

        f1c = fmap1.astype(jnp.float32)
        f2c = fmap2.astype(jnp.float32)
        mean_response = corr_mean_response(f1c, f2c)

        def lookup(coords):
            return corr_lookup_alternate(f1c, f2c, coords, radius,
                                         cfg.corr_levels,
                                         chunk=min(cfg.alt_chunk,
                                                   B * H1 * W1))
    elif cfg.corr_impl == "local" and B == 1:
        # block-local recentered volume: the TPU fast path (see
        # corr.build_local_corr) — exact within +-local_margin cells of
        # post-prewarp residual, saturated beyond
        from .corr import (LocalCorrVolumes, build_local_corr,
                           corr_lookup_local, corr_lookup_local_blocked,
                           corr_mean_response)

        vol_dtype = (jnp.bfloat16 if cfg.precision in ("default", "bf16")
                     else None)
        use_p = (cfg.local_pallas if cfg.local_pallas is not None
                 else jax.default_backend() == "tpu")
        local_vol = build_local_corr(
            fmap1.astype(jnp.float32), fmap2.astype(jnp.float32),
            radius, cfg.corr_levels, margin=cfg.local_margin,
            out_dtype=vol_dtype, precision=cfg.lax_precision,
            use_pallas=use_p, layout="p" if use_p else "q")
        if corr_shard is not None:
            # spatial scale-out: blocks are mutually independent, so the
            # hook shards each level over its leading (block) axis —
            # construction AND lookup partition with zero communication
            # (parallel/sharding.py spatial_sharded_forward 'local' mode)
            local_vol = LocalCorrVolumes(
                [corr_shard(l, v) for l, v in enumerate(local_vol.volumes)],
                local_vol.meta)
        mean_response = corr_mean_response(fmap1.astype(jnp.float32),
                                           fmap2.astype(jnp.float32))

        if use_p:
            # hot loop: blocked Pallas slab lookup, zero relayouts (the
            # motion encoder's convc1 absorbs layout + channel order)
            def lookup(coords):
                return corr_lookup_local_blocked(local_vol, coords, radius,
                                                 check=cfg.fine_check)

            def lookup_natural(coords):
                return corr_lookup_local(local_vol, coords, radius)
        else:
            def lookup(coords):
                return corr_lookup_local(local_vol, coords, radius)
    else:
        # Build the pyramid fused (one MXU einsum per level against pooled
        # — and, for window-slicing impls, pre-padded — fmap2): the multi-GB
        # level-0 volume is written once and never re-read for pooling or
        # padding, and mean_response comes from features in O(Q*D).
        from .corr import corr_pyramid_fused
        from ..ops.pallas.corr_lookup import _pad_amount

        sliced_impl = cfg.corr_impl in ("dslice", "band")
        vol_dtype = (jnp.bfloat16 if cfg.precision in ("default", "bf16")
                     else None)
        pyramid, mean_response = corr_pyramid_fused(
            fmap1.astype(jnp.float32), fmap2.astype(jnp.float32),
            cfg.corr_levels, pad=_pad_amount(radius) if sliced_impl else 0,
            out_dtype=vol_dtype, precision=cfg.lax_precision,
            shard_level=corr_shard)

        if cfg.corr_impl == "pallas":
            # fused dense-pyramid lookup kernel (r4: compiled-legal via
            # 8-aligned band loads + one-hot row/lane select matmuls;
            # pad_pyramid adds the window pad, Mosaic tile alignment and
            # the 24-row band tail the kernel requires)
            from ..ops.pallas.corr_lookup import (fused_corr_lookup,
                                                  pad_pyramid)

            padded = pad_pyramid(pyramid, radius)

            def lookup(coords):
                return fused_corr_lookup(padded, coords, radius=radius)
        elif cfg.corr_impl == "dslice":
            from .corr import corr_lookup_dslice

            def lookup(coords):
                return corr_lookup_dslice(pyramid, coords, radius)
        elif cfg.corr_impl == "band":
            from .corr import corr_lookup_band

            def lookup(coords):
                return corr_lookup_band(pyramid, coords, radius)
        else:
            # 'local' with B > 1 falls back to the exact one-hot path
            impl = "onehot" if cfg.corr_impl == "local" else cfg.corr_impl

            def lookup(coords):
                return corr_lookup(pyramid, coords, radius, impl=impl)

    if lookup_natural is None:
        lookup_natural = lookup

    coords0 = coords_grid(B, H1, W1)
    coords1 = coords0 if flow_init is None else coords0 + flow_init

    # hoist the loop-invariant context (`inp`) contribution to the GRU
    # convs out of the 12x scan (exact by conv linearity, see _gru_gates);
    # the convex-upsample mask convs move AFTER the scan — only the final
    # iteration's mask is ever consumed (ref:weighted_raft.py:229-245 emits
    # per-iteration upsamples only for training supervision, which our
    # trainer does not use; tracker consumes the last)
    pre = (None if cfg.small else
           precompute_gru_context(params["update_block"]["gru"], inp, hdim))
    # r4 measured defaults: the fused GRU kernel is on-chip CORRECT
    # (tools/gru_ab.py PASS) and marginally faster in isolation (4.50 vs
    # 4.71 ms/pair), but the full-frame graph runs SLOWER with it (12.0
    # vs 14.6 fps @1080p — the kernel boundary forces per-iteration f32
    # carry pads/copies XLA otherwise fuses away), so both loop kernels
    # are opt-in (cfg flag / WOFT_BENCH_GRU|TAIL) rather than auto-on.
    gru_pallas = (bool(cfg.gru_pallas) and not cfg.small and B == 1
                  and cfg.compute_dtype == jnp.bfloat16)
    tail_pallas = (bool(cfg.tail_pallas) and not cfg.small and B == 1
                   and cfg.compute_dtype == jnp.bfloat16)

    def step(carry, _):
        net, coords1 = carry
        # per-iteration detach of the coordinate chain (ref:weighted_raft.py:229)
        coords1 = jax.lax.stop_gradient(coords1)
        corr_feat = lookup(coords1)
        flow = coords1 - coords0
        net, _, delta = update_block_apply(
            params["update_block"], net, inp, corr_feat, flow, cfg.small,
            pre=pre, with_mask=False, gru_pallas=gru_pallas,
            tail_pallas=tail_pallas)
        return (net, coords1 + delta), None

    (net, coords1), _ = jax.lax.scan(
        step, (net, coords1), None, length=iters)

    up_mask = (None if cfg.small
               else mask_from_net(params["update_block"], net))
    flow = coords1 - coords0
    if up_mask is None:
        flow_up = upflow8(flow)
    else:
        flow_up = convex_upsample(flow, up_mask)

    out = {"flow": flow, "flow_up": flow_up,
           "fmap1": fmap1, "fmap2": fmap2}

    if cfg.variant == "orig":
        return out

    k = 2 * radius + 1
    if sparse_weight_head and cfg.variant == "weighted" and B == 1:
        # defer the weight head: identical logits, only at requested cells
        assert up_mask is not None, "sparse weight head needs convex up_mask"
        coords1_flat = coords1.reshape(H1 * W1, 2)
        mr_flat = mean_response.reshape(H1 * W1)

        local_p = (cfg.corr_impl == "local" and not cfg.alternate_corr
                   and local_vol.meta.get("layout") == "p")
        if local_p:
            # p-layout volumes have queries in lanes — scattered per-cell
            # window reads would be lane gathers. One extra dense Pallas
            # lookup at the final coords (~1 ms) + row select is exact
            # and cheaper than any sparse formulation here.
            corr_dense_flat = lookup_natural(coords1).reshape(H1 * W1, -1)

        def _wh_at(cells):
            M = cells.shape[0]
            c = coords1_flat[cells][None, None]           # (1, 1, M, 2)
            if cfg.alternate_corr:
                from .corr import corr_lookup_alternate
                f1_sub = f1c.reshape(H1 * W1, -1)[cells][None, None]
                corr_f = corr_lookup_alternate(
                    f1_sub, f2c, c, radius, cfg.corr_levels,
                    chunk=min(cfg.alt_chunk, M))
            elif cfg.corr_impl == "local":
                if local_p:
                    corr_f = corr_dense_flat[cells]
                else:
                    from .corr import corr_lookup_local_sparse
                    corr_f = corr_lookup_local_sparse(
                        local_vol, coords1_flat[cells], cells, radius)
            else:
                sub_pyr = [p[cells] for p in pyramid]     # (M, Hl, Wl)
                if cfg.corr_impl == "pallas":
                    from ..ops.pallas.corr_lookup import fused_corr_lookup
                    corr_f = fused_corr_lookup(sub_pyr, c, radius=radius)
                elif cfg.corr_impl == "dslice":
                    from .corr import corr_lookup_dslice
                    corr_f = corr_lookup_dslice(sub_pyr, c, radius)
                elif cfg.corr_impl == "band":
                    from .corr import corr_lookup_band
                    corr_f = corr_lookup_band(sub_pyr, c, radius)
                else:
                    corr_f = corr_lookup(sub_pyr, c, radius,
                                         impl=cfg.corr_impl)
            corr_s = corr_f.reshape(1, 1, M, k, k, cfg.corr_levels)
            w = weight_head_apply(params["weight_head"], corr_s,
                                  mr_flat[cells].reshape(1, 1, M),
                                  cfg.weight_head_structure)
            return w.reshape(M)

        def weight_head_at(cells):
            """cells: (M,) int32 flat 1/8-grid indices -> (M,) logits,
            bit-equal to the dense head at those cells. Invoked after the
            forward returns, so it re-enters this config's precision scope."""
            with layers.precision_scope(cfg.lax_precision, cfg.compute_dtype):
                return _wh_at(cells)

        out.update(up_mask=up_mask, weight_head_at=weight_head_at,
                   mean_response=mean_response)
        return out

    # weight head over the final lookup (ref:weighted_raft.py:258-290)
    corr_final = lookup_natural(coords1)                  # (B,H1,W1,L*k*k)
    # the reference's rearrange splits channels as (H_patch, W_patch, levels)
    corr_sample = corr_final.reshape(B, H1, W1, k, k, cfg.corr_levels)
    weights = weight_head_apply(params["weight_head"], corr_sample,
                                mean_response, cfg.weight_head_structure)

    if up_mask is None:
        weights_up = upflow8(weights) / 8.0
    else:
        weights_up = convex_upsample(weights, up_mask) / 8.0

    out.update(weights=weights, weights_up=weights_up,
               mean_response=mean_response)

    if cfg.variant == "weighted_masked":
        warped = grid_sample(fmap2, coords1)              # (B,H1,W1,D)
        mask = mask_head_apply(params["mask_head"], fmap1, warped,
                               cfg.mask_head_structure)
        if up_mask is None:
            mask_up = upflow8(mask) / 8.0
        else:
            mask_up = convex_upsample(mask, up_mask) / 8.0
        out["mask_up"] = mask_up
    return out


# alias: the 'orig' RAFT is the same forward with variant='orig'
WeightedRaft = weighted_raft_forward


# ---------------------------------------------------------------------------
# initialisation (random weights with torch-matching structure)
# ---------------------------------------------------------------------------

def _init_block(key, cin, planes, norm_fn, stride, small):
    ks = jax.random.split(key, 4)
    if small:  # bottleneck
        p = {"conv1": layers.init_conv(ks[0], 1, 1, cin, planes // 4),
             "conv2": layers.init_conv(ks[1], 3, 3, planes // 4, planes // 4),
             "conv3": layers.init_conv(ks[2], 1, 1, planes // 4, planes)}
        if norm_fn in ("batch", "group"):
            p["norm1"] = layers.init_norm(norm_fn, planes // 4)
            p["norm2"] = layers.init_norm(norm_fn, planes // 4)
            p["norm3"] = layers.init_norm(norm_fn, planes)
    else:
        p = {"conv1": layers.init_conv(ks[0], 3, 3, cin, planes),
             "conv2": layers.init_conv(ks[1], 3, 3, planes, planes)}
        if norm_fn in ("batch", "group"):
            p["norm1"] = layers.init_norm(norm_fn, planes)
            p["norm2"] = layers.init_norm(norm_fn, planes)
    if stride != 1:
        p["downsample"] = {"0": layers.init_conv(ks[3], 1, 1, cin, planes)}
        if norm_fn in ("batch", "group"):
            p["downsample"]["1"] = layers.init_norm(norm_fn, planes)
    return p


def _init_encoder(key, output_dim, norm_fn, small):
    dims = (32, 32, 64, 96) if small else (64, 64, 96, 128)
    ks = jax.random.split(key, 8)
    p = {"conv1": layers.init_conv(ks[0], 7, 7, 3, dims[0], kaiming_out=True)}
    if norm_fn in ("batch", "group"):
        p["norm1"] = layers.init_norm(norm_fn, dims[0])
    cin = dims[0]
    for i, (name, stride) in enumerate((("layer1", 1), ("layer2", 2),
                                        ("layer3", 2))):
        planes = dims[i + 1]
        p[name] = {"0": _init_block(ks[1 + 2 * i], cin, planes, norm_fn,
                                    stride, small),
                   "1": _init_block(ks[2 + 2 * i], planes, planes, norm_fn,
                                    1, small)}
        cin = planes
    p["conv2"] = layers.init_conv(ks[7], 1, 1, cin, output_dim)
    return p


def _init_head(key, structure, cin):
    p = {}
    idx = 0
    for i, spec in enumerate(structure):
        ch, k = spec if isinstance(spec, (tuple, list)) else (spec, 3)
        key, sub = jax.random.split(key)
        p[str(idx)] = layers.init_conv(sub, k, k, cin, ch)
        cin = ch
        idx += 2
    key, sub = jax.random.split(key)
    p[str(idx)] = layers.init_conv(sub, 1, 1, cin, 1)
    return {"net": p}


def init_raft_params(key, cfg: RaftConfig):
    """Random parameters with the exact torch checkpoint structure."""
    ks = jax.random.split(key, 8)
    hdim, cdim = cfg.hidden_dim, cfg.context_dim
    cor_planes = cfg.corr_levels * (2 * cfg.radius + 1) ** 2

    params = {
        "fnet": _init_encoder(ks[0], cfg.fnet_dim, "instance", cfg.small),
        "cnet": _init_encoder(ks[1], hdim + cdim,
                              "none" if cfg.small else "batch", cfg.small),
    }
    if cfg.small:
        enc = {"convc1": layers.init_conv(ks[2], 1, 1, cor_planes, 96),
               "convf1": layers.init_conv(ks[3], 7, 7, 2, 64),
               "convf2": layers.init_conv(ks[4], 3, 3, 64, 32),
               "conv": layers.init_conv(ks[5], 3, 3, 128, 80)}
        gin = hdim + 82 + 64
        gru = {n: layers.init_conv(k, 3, 3, gin, hdim)
               for n, k in zip(("convz", "convr", "convq"),
                               jax.random.split(ks[6], 3))}
        fh = {"conv1": layers.init_conv(jax.random.fold_in(ks[7], 0),
                                        3, 3, hdim, 128),
              "conv2": layers.init_conv(jax.random.fold_in(ks[7], 1),
                                        3, 3, 128, 2)}
        params["update_block"] = {"encoder": enc, "gru": gru, "flow_head": fh}
    else:
        enc = {"convc1": layers.init_conv(ks[2], 1, 1, cor_planes, 256),
               "convc2": layers.init_conv(jax.random.fold_in(ks[2], 1),
                                          3, 3, 256, 192),
               "convf1": layers.init_conv(ks[3], 7, 7, 2, 128),
               "convf2": layers.init_conv(ks[4], 3, 3, 128, 64),
               "conv": layers.init_conv(ks[5], 3, 3, 64 + 192, 126)}
        gin = 128 + hdim
        names = ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2")
        shapes = (((1, 5), (0, 2)),) * 3 + (((5, 1), (2, 0)),) * 3
        gru = {}
        for n, ((kh, kw), _), k in zip(names, shapes,
                                       jax.random.split(ks[6], 6)):
            gru[n] = layers.init_conv(k, kh, kw, hdim + gin, hdim)
        fh = {"conv1": layers.init_conv(jax.random.fold_in(ks[7], 0),
                                        3, 3, hdim, 256),
              "conv2": layers.init_conv(jax.random.fold_in(ks[7], 1),
                                        3, 3, 256, 2)}
        mask = {"0": layers.init_conv(jax.random.fold_in(ks[7], 2),
                                      3, 3, 128, 256),
                "2": layers.init_conv(jax.random.fold_in(ks[7], 3),
                                      1, 1, 256, 64 * 9)}
        params["update_block"] = {"encoder": enc, "gru": gru,
                                  "flow_head": fh, "mask": mask}

    if cfg.variant in ("weighted", "weighted_masked"):
        params["weight_head"] = _init_head(
            jax.random.fold_in(key, 101), cfg.weight_head_structure,
            cfg.corr_levels + 1)
    if cfg.variant == "weighted_masked":
        params["mask_head"] = _init_head(
            jax.random.fold_in(key, 102), cfg.mask_head_structure,
            2 * cfg.fnet_dim)
    return params
