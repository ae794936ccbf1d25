"""The WOFT tracker: a pure function over an explicit state pytree.

TPU-native rework of ref:pytracking/tracker/YAOF_tracker_single_control.py.
The reference's mutable class + dynamic-shape point filtering becomes:

- ``TrackerState``: an immutable pytree (template features, homography
  history, lost counters) — jit/vmap/scan-able,
- ``build_track_step``: compiles ``(params, state, frame) ->
  (state, H_cur2init, meta)`` with the whole per-frame pipeline on device:
  pre-warp (grid-sampled ``warpPerspective`` twin), WeightedRAFT flow,
  mask-as-weights TC selection, Sobol-500 gather, weighted QR homography
  fit, inlier self-check, and the local-flow fallback ladder under
  ``lax.cond`` (only the taken branch executes at runtime),
- ``WOFTTracker``: a thin host shell with the reference's
  ``init``/``track``/``set_fast_meta`` API (numpy in/out, BGR uint8).

Static-shape conversions (SURVEY.md section 7.1/7.4):
- boolean TC filtering -> validity masks + weight zeroing (exact for the
  weighted LSq; the plain-LSq ablation passes 0/1 validity as weights,
  which is exact row removal),
- Sobol-500 subsampling -> fixed 500-slot gather with duplicate-collapse
  validity (ops.sampling.masked_sobol_gather),
- the inlier fraction divides by the count of *valid* points, matching the
  reference's mean over its dynamically-sized point set
  (ref:configs/WOFT.py:14-21).
"""

import logging
from dataclasses import dataclass
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.homography import (
    compose_h,
    find_homography_wls_qr,
    find_homography_irls_qr,
    irls_huber,
    proj_errors,
)
from ..models.raft import RaftConfig, weighted_raft_forward, encode_template
from ..ops.pad import make_padder
from ..ops.sampling import masked_sobol_gather
from ..ops.warp import (warp_perspective, warp_perspective_fast,
                        warp_validity_at)

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class TrackerParams:
    """Static tracker configuration (jit-hashable).

    Field defaults are the canonical WOFT settings
    (ref:pytracking/configs/YAOFT_single_control_repRAFT_sub500_noreliableinl_wLSq.py)."""
    subsample_n: int = 500
    inlier_px: float = 5.0
    min_inlier_frac: float = 0.2
    no_prewarp_after_n: int = 10
    estimator: str = "wls_qr"       # 'wls_qr' | 'irls_huber' | 'plain_qr'
                                    # | 'cvransac' | 'trs' (host callbacks)
    irls_k: float = 2.0
    irls_iters: int = 5
    ransac_thr: float = 3.0         # ablation_09 (ref:pytracking/configs/YAOFT_single_control_repRAFT_sub500_noreliableinl_cvransac.py:27)
    ransac_iters: int = 10000
    redetection: str = "inliers"    # 'inliers' | 'never' | 'always'
    use_pw_mask: bool = True        # mask TCs by the pre-warp validity region
    no_local_h: bool = False        # skip the local-flow fallback
    host_fallback: bool = False     # dispatch the local-flow fallback as a
                                    # separately-jitted program from the
                                    # host (reference behavior, YAOF:171) —
                                    # the TPU runtime rejects two full-RAFT
                                    # branches inside one lax.cond at
                                    # >=720p frame sizes (InvalidArgument);
                                    # window-sized cond graphs are fine
    downscale: int = 0              # host-side input downscale factor
    padding_mode: str = "nopad"
    sparse_weights: bool = True     # evaluate the weight head + convex
                                    # upsample only at the cells the solver
                                    # consumes (identical logits, ~65x less
                                    # head work at 1080p); auto-disabled for
                                    # non-default flow seams/variants
    multi_fit_chunk: int = 64       # shared-flow multi mode: vmap the
                                    # per-target TC-select+fit over at most
                                    # this many targets at once, lax.map
                                    # over groups beyond it — the vmapped
                                    # sparse weight-head patches are the
                                    # HBM ceiling (x128 @1080p OOM'd at
                                    # 2x11.1 GB, measured r5); <=64 keeps
                                    # every recorded graph unchanged


class TrackerState:
    """Immutable tracker state pytree.

    Fields (all device arrays):
        template_img: (1, H, W, 3) float RGB template frame.
        template_feats: (fmap1, net0, inp) pre-encoded template features.
        template_mask: (H, W) bool target mask.
        prev_img: (1, H, W, 3) float RGB previous frame.
        prev_h2init: (3, 3) f32.
        last_good_h2init: (3, 3) f32.
        lost: () bool. n_lost: () int32.
    (ref:YAOF_tracker_single_control.py:40-47)
    """

    def __init__(self, template_img, template_feats, template_mask, prev_img,
                 prev_h2init, last_good_h2init, lost, n_lost):
        self.template_img = template_img
        self.template_feats = template_feats
        self.template_mask = template_mask
        self.prev_img = prev_img
        self.prev_h2init = prev_h2init
        self.last_good_h2init = last_good_h2init
        self.lost = lost
        self.n_lost = n_lost

    def tree_flatten(self):
        return ((self.template_img, self.template_feats, self.template_mask,
                 self.prev_img, self.prev_h2init, self.last_good_h2init,
                 self.lost, self.n_lost), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrackerState,
    lambda s: s.tree_flatten(),
    TrackerState.tree_unflatten)


def _host_robust_fit(estimator, thr, iters):
    """Host-side robust estimator (cv2 RANSAC / TRS similarity) as a
    pure_callback body: filters valid rows (dynamic shapes are fine on
    host), fits, and returns NaNs on solver failure so the device-side
    finiteness guards take the fallback ladder — the exact analog of the
    reference's try/except around its cv2 solvers (ref:YAOF:202-204)."""
    from ..geometry.homography import (find_homography_cvransac,
                                       find_homography_trs)

    def fit(a, b, v):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        v = np.asarray(v) > 0.5
        out = np.full((a.shape[0], 3, 3), np.nan, np.float32)
        for i in range(a.shape[0]):
            sa, sb = a[i][v[i]], b[i][v[i]]
            if sa.shape[0] < 4:
                continue
            try:
                if estimator == "cvransac":
                    out[i] = find_homography_cvransac(
                        sa[None], sb[None], max_iters=iters, thr=thr)[0]
                else:
                    out[i] = find_homography_trs(sa[None], sb[None])[0]
            except Exception:       # noqa: BLE001 — NaN H = fallback
                pass
        return out

    return fit


def _estimate_h(tp: TrackerParams, pts_a, pts_b, weights, valid):
    """Fit H mapping pts_a -> pts_b with the configured estimator.

    pts_a/pts_b: (1, N, 2); weights: (1, N) sigmoided reliabilities;
    valid: (1, N) 0/1 selection."""
    if tp.estimator in ("cvransac", "trs"):
        fit = _host_robust_fit(tp.estimator, tp.ransac_thr, tp.ransac_iters)
        return jax.pure_callback(
            fit,
            jax.ShapeDtypeStruct((pts_a.shape[0], 3, 3), jnp.float32),
            pts_a, pts_b, valid)
    if tp.estimator == "plain_qr":
        # plain LSq ablation: 0/1 validity = exact point removal
        return find_homography_wls_qr(pts_a, pts_b, valid)
    w = weights * valid
    if tp.estimator == "irls_huber":
        return find_homography_irls_qr(
            pts_a, pts_b, w,
            reweighting_fn=lambda r: irls_huber(r, k=tp.irls_k),
            n_iter=tp.irls_iters)
    return find_homography_wls_qr(pts_a, pts_b, w)


def _sparse_point_weights(weight_head_at, up_mask, idx, W_img, H1, W1):
    """Sigmoided reliability weights at full-res points, sparsely.

    Reproduces sigmoid(convex_upsample(weight_head(...), up_mask)/8) at the
    ``idx`` pixels only: each full-res point's upsampled weight is the
    softmaxed 3x3 convex combination of its parent cell's neighbours'
    logits (models/raft.py:convex_upsample), and the weight head itself is
    per-cell independent — so only |idx|*9 cells are ever evaluated.

    Args:
        weight_head_at: (M,) flat-cell -> (M,) logits closure from
            ``weighted_raft_forward(..., sparse_weight_head=True)``.
        up_mask: (1, H1, W1, 9*64) convex upsampling mask (pre-softmax).
        idx: (n,) int32 flat full-res pixel indices.
    Returns:
        (n,) f32 sigmoided weights — matching the dense path pointwise.
    """
    n = idx.shape[0]
    px = idx % W_img
    py = idx // W_img
    cx, sx = px // 8, px % 8
    cy, sy = py // 8, py % 8
    d = jnp.arange(3, dtype=jnp.int32) - 1
    cyn = cy[:, None, None] + d[None, :, None]               # (n, 3, 1)
    cxn = cx[:, None, None] + d[None, None, :]               # (n, 1, 3)
    nb_ok = ((cyn >= 0) & (cyn < H1) & (cxn >= 0) & (cxn < W1))
    cells = (jnp.clip(cyn, 0, H1 - 1) * W1
             + jnp.clip(cxn, 0, W1 - 1)).reshape(n * 9)
    logits = weight_head_at(cells).reshape(n, 9)
    # outside-grid neighbours contribute logit 0 (the dense path's zero pad)
    logits = logits * nb_ok.reshape(n, 9).astype(logits.dtype)

    m = up_mask.reshape(H1 * W1, 9, 8, 8)[cy * W1 + cx]      # (n, 9, 8, 8)
    m = jax.nn.softmax(m, axis=1)
    msel = m[jnp.arange(n), :, sy, sx]                       # (n, 9)
    return jax.nn.sigmoid(jnp.sum(msel * logits, axis=1))


def _select_tcs(flow, weights, valid_mask, n):
    """Dense flow -> fixed-size TC set.

    flow: (1, H, W, 2); weights: (1, H, W, 1) sigmoided; valid_mask: (H*W,)
    bool. Returns (src (1,n,2), dst (1,n,2), w (1,n), valid (1,n))."""
    H, W = flow.shape[1:3]
    hw = H * W
    xs = (jnp.arange(hw) % W).astype(jnp.float32)
    ys = (jnp.arange(hw) // W).astype(jnp.float32)
    src = jnp.stack([xs, ys], axis=-1)                        # (HW, 2)
    dst = src + flow.reshape(hw, 2)

    idx, sel_valid = masked_sobol_gather(valid_mask, n)
    g_src = src[idx][None]
    g_dst = dst[idx][None]
    if weights is None:
        g_w = None
    else:
        g_w = weights.reshape(hw)[idx][None]
    return g_src, g_dst, g_w, sel_valid[None].astype(jnp.float32), idx


def _select_tcs_sparse(flow, forward_out, valid_mask, n):
    """Sparse-weight-head twin of ``_select_tcs``: same Sobol selection,
    weights computed only at the selected points."""
    H, W = flow.shape[1:3]
    src_g, dst_g, _, sel, idx = _select_tcs(flow, None, valid_mask, n)
    w = _sparse_point_weights(forward_out["weight_head_at"],
                              forward_out["up_mask"], idx,
                              W, H // 8, W // 8)
    return src_g, dst_g, w[None], sel


def _success_check(tp: TrackerParams, H, pts_a, pts_b, valid):
    """Inlier-fraction redetection check (ref:configs/WOFT.py:14-21).

    pts_a/pts_b: (1, N, 2) (H maps a->b); valid: (1, N)."""
    errs = proj_errors(H, jnp.swapaxes(pts_a, 1, 2),
                       jnp.swapaxes(pts_b, 1, 2))              # (1, N)
    inliers = (errs <= tp.inlier_px).astype(jnp.float32) * valid
    frac = jnp.sum(inliers) / jnp.maximum(jnp.sum(valid), 1.0)
    if tp.redetection == "never":
        ok = jnp.asarray(False)
    elif tp.redetection == "always":
        ok = jnp.asarray(True)
    else:
        ok = frac > tp.min_inlier_frac
    ok &= jnp.all(jnp.isfinite(H))
    return ok, frac


def build_track_step(raft_cfg: RaftConfig, tp: TrackerParams, flow_fn=None):
    """Build the jitted per-frame step:
    ``(params, state, frame) -> (new_state, H_cur2init, meta)``.

    ``frame``: (1, H, W, 3) float RGB in [0, 255]. ``meta`` is a dict of
    device scalars/matrices mirroring the reference's SimpleNamespace
    diagnostics (ref:YAOF_tracker_single_control.py:58-285).

    ``flow_fn(params, img1, img2, template_feats) -> (flow (1,H,W,2),
    weights (1,H,W,1) sigmoided)`` overrides the flow network — the L3 flow
    abstraction seam (SURVEY.md section 1); tests inject oracle flow here.
    """

    def default_flow(params, img1, img2, template_feats=None):
        padder = make_padder(tp.padding_mode, img2.shape)
        if template_feats is None:
            p1, p2 = padder.pad(img1, img2)
            out = weighted_raft_forward(params, raft_cfg, p1, p2)
        else:
            (p2,) = padder.pad(img2)
            out = weighted_raft_forward(params, raft_cfg, None, p2,
                                        template_feats=template_feats)
        flow = padder.unpad(out["flow_up"])
        weights = jax.nn.sigmoid(padder.unpad(out["weights_up"])) \
            if "weights_up" in out else jnp.ones_like(flow[..., :1])
        if "mask_up" in out:       # 'weighted_masked': visibility logits
            return flow, weights, jax.nn.sigmoid(padder.unpad(out["mask_up"]))
        return flow, weights

    base_flow = flow_fn if flow_fn is not None else default_flow

    # sparse weight-head path: identical numerics, the head + convex
    # upsample run only at the ~n*9 cells the 500-point solver consumes
    # (the head convolves per-cell over patch dims — see models/raft.py)
    sparse_ok = (flow_fn is None and tp.sparse_weights
                 and raft_cfg.variant == "weighted" and not raft_cfg.small
                 and tp.padding_mode == "nopad")

    def run_flow(params, img1, img2, template_feats=None):
        """Normalise the flow seam to (flow, weights, vis-or-None); the
        'weighted_masked' variant adds a visibility mask
        (ref:optical_flow/raft.py:180-181,215-216)."""
        res = base_flow(params, img1, img2, template_feats)
        if len(res) == 2:
            return res[0], res[1], None
        return res

    def local_h(params, prev_img, frame, prev_h2init, template_mask):
        """Local fallback: prev -> current flow chained onto prev_h2init
        (ref:YAOF:171-207). Dense path always — the sparse weight-head
        graph is rejected by the TPU runtime inside lax.cond, and the
        fallback never runs at steady state (logits identical either way,
        tests/test_tracker.py sparse==dense)."""
        hw = frame.shape[1] * frame.shape[2]
        prev_mask = warp_perspective(
            template_mask[None, :, :, None].astype(jnp.float32),
            jnp.linalg.inv(prev_h2init), mode="nearest")
        lvalid = prev_mask.reshape(hw) > 0
        lflow, lweights, lvis = run_flow(params, prev_img, frame)
        if lvis is not None:
            lvalid &= lvis.reshape(hw) > 0.5
        lsrc, ldst, lw, lsel, _ = _select_tcs(lflow, lweights, lvalid,
                                              tp.subsample_n)
        H_flow = _estimate_h(tp, ldst, lsrc, lw, lsel)[0]  # cur -> prev
        # H_flow applies first (cur->prev), then prev_h2init (prev->init)
        # (ref:YAOF:201 compose_H(H_flow, self.prev_H2init))
        H_local = compose_h(H_flow, prev_h2init)
        # solver-failure guard (ref:YAOF:202-204)
        return jnp.where(jnp.all(jnp.isfinite(H_local)), H_local,
                         prev_h2init)

    def step(params, state: TrackerState, frame):
        H_img, W_img = frame.shape[1:3]
        hw = H_img * W_img

        # redetection reset (ref:YAOF:78-79)
        reset = state.n_lost > tp.no_prewarp_after_n
        last_good = jnp.where(reset, jnp.eye(3, dtype=jnp.float32),
                              state.last_good_h2init)

        # pre-warp by the last good homography (ref:YAOF:83-96); on TPU at
        # big frames this takes the MXU block-warp kernel with an exact
        # gather fallback outside its pose envelope (ops/pallas/warp.py).
        # In bf16 model mode the kernel's blend matmul may use the fast
        # MXU path: the encoders quantize the prewarped image to bf16
        # anyway, so the ~0.5-intensity rounding is below the model's own
        # input quantization; parity modes keep the bit-exact blend.
        prewarped = warp_perspective_fast(
            frame, last_good,
            precision="default" if raft_cfg.precision == "bf16"
            else "highest")

        # global flow template -> prewarped current (ref:YAOF:98-131)
        if sparse_ok:
            fo = weighted_raft_forward(params, raft_cfg, None, prewarped,
                                       template_feats=state.template_feats,
                                       sparse_weight_head=True)
            flow, weights, vis = fo["flow_up"], None, None
        else:
            flow, weights, vis = run_flow(params, state.template_img,
                                          prewarped, state.template_feats)

        # TC validity: template mask + pre-warp region/bounds (ref:YAOF:287-312)
        dst = (jnp.stack(
            [(jnp.arange(hw) % W_img).astype(jnp.float32),
             (jnp.arange(hw) // W_img).astype(jnp.float32)], -1)
            + flow.reshape(hw, 2))
        dst_int = jnp.round(dst).astype(jnp.int32)
        oob = (jnp.any(dst < 0, axis=-1)
               | (dst_int[:, 0] >= W_img) | (dst_int[:, 1] >= H_img))
        in_pw = ~oob
        if tp.use_pw_mask:
            # pre-warp validity AT the dst points, analytically — the
            # mask is defined by a box check on Hinv @ p, so evaluating
            # it at clip(dst_int) equals gathering warp_validity_mask
            # there, without the 2M-point scalar gather (~22ms at 1080p)
            pts = jnp.stack([jnp.clip(dst_int[:, 0], 0, W_img - 1),
                             jnp.clip(dst_int[:, 1], 0, H_img - 1)], -1)
            in_pw &= warp_validity_at(last_good, (H_img, W_img), pts)
        valid = state.template_mask.reshape(hw) & in_pw
        if vis is not None:
            # visibility mask feeds TC validity ('weighted_masked',
            # ref:weighted_raft.py:296-310)
            valid &= vis.reshape(hw) > 0.5

        if sparse_ok:
            src_g, dst_g, w_g, sel = _select_tcs_sparse(flow, fo, valid,
                                                        tp.subsample_n)
        else:
            src_g, dst_g, w_g, sel, _ = _select_tcs(flow, weights, valid,
                                                    tp.subsample_n)

        # weighted fit: current-prewarped -> template (ref:YAOF:151-159)
        H_pw2init = _estimate_h(tp, dst_g, src_g, w_g, sel)    # (1,3,3)
        H_global = compose_h(last_good, H_pw2init[0])

        ok, inlier_frac = _success_check(tp, H_pw2init, dst_g, src_g, sel[0:1])

        # local fallback: prev -> current flow chained onto prev_H2init
        # (ref:YAOF:171-207); lax.cond executes only the taken branch.
        def local_branch(_):
            return local_h(params, state.prev_img, frame,
                           state.prev_h2init, state.template_mask)

        if tp.no_local_h or tp.host_fallback or tp.redetection == "always":
            # host_fallback: the wrapper below patches in the local H when
            # the check fails (separately-jitted program, reference
            # behavior). redetection='always': ok is constant True, so the
            # cond is folded away at trace time — big-frame trackers must
            # never carry two full-RAFT branches in one lax.cond (the TPU
            # runtime rejects them >=~720p, see TrackerParams.host_fallback)
            H_cur2init = H_global
        elif tp.redetection == "never":
            # constant False: always the local branch, no cond emitted
            H_cur2init = local_branch(None)
        else:
            H_cur2init = jax.lax.cond(ok, lambda _: H_global, local_branch,
                                      operand=None)

        lost = ~ok
        n_lost = jnp.where(ok, 0, state.n_lost + 1)
        new_state = TrackerState(
            template_img=state.template_img,
            template_feats=state.template_feats,
            template_mask=state.template_mask,
            prev_img=frame,
            prev_h2init=H_cur2init,
            last_good_h2init=jnp.where(ok, H_cur2init, last_good),
            lost=lost,
            n_lost=n_lost)

        meta = {
            "last_good_H2init": last_good,
            "H_global_cur2init": H_global,
            "global_H_success": ok,
            "inlier_frac": inlier_frac,
            "lost": lost,
            "N_lost": n_lost,
        }
        return new_state, H_cur2init, meta

    if tp.host_fallback and not tp.no_local_h:
        import numpy as np

        # no state donation: the fallback program re-reads the pre-step
        # state (prev_img, prev_h2init) after the main program ran
        main = jax.jit(step)
        local = jax.jit(local_h)

        def host_step(params, state, frame):
            new_state, H_global, meta = main(params, state, frame)
            if not bool(np.asarray(meta["global_H_success"])):
                hl = local(params, state.prev_img, frame,
                           state.prev_h2init, state.template_mask)
                meta = dict(meta, H_local_cur2init=hl)
                new_state = TrackerState(
                    template_img=new_state.template_img,
                    template_feats=new_state.template_feats,
                    template_mask=new_state.template_mask,
                    prev_img=new_state.prev_img,
                    prev_h2init=hl,
                    last_good_h2init=new_state.last_good_h2init,
                    lost=new_state.lost,
                    n_lost=new_state.n_lost)
                return new_state, hl, meta
            return new_state, H_global, meta

        host_step.main = main       # expose the jitted main program
        host_step._raw_step = step
        return host_step

    # No state donation on TPU: donating a buffer that is consumed inside
    # the pre-warp lax.cond (pallas kernel vs gather branches) is rejected
    # by the TPU runtime with an opaque InvalidArgument at big frame sizes
    # (bisected r3: identical graph runs without donation). The extra
    # state copy is noise next to full-frame compute; the device-resident
    # window step (tracker/window_step.py) keeps its own donation.
    donate = () if jax.default_backend() == "tpu" else (1,)
    jitted = jax.jit(step, donate_argnums=donate)
    jitted._raw_step = step         # un-jitted body (debug/eager use)
    return jitted


def tracker_init_state(params, raft_cfg: RaftConfig, tp: TrackerParams,
                       template_img, template_mask, encode=True):
    """Build the initial TrackerState (ref:YAOF:26-47).

    template_img: (1, H, W, 3) float RGB; template_mask: (H, W) bool.
    ``encode=False`` skips template feature pre-encoding (oracle-flow
    tests)."""
    if encode:
        padder = make_padder(tp.padding_mode, template_img.shape)
        (padded,) = padder.pad(template_img)
        feats = encode_template(params, raft_cfg, padded)
    else:
        feats = None
    # distinct buffers everywhere: the state is donated per step and XLA
    # rejects donating one buffer twice
    return TrackerState(
        template_img=template_img,
        template_feats=feats,
        template_mask=template_mask,
        prev_img=jnp.copy(template_img),
        prev_h2init=jnp.eye(3, dtype=jnp.float32),
        last_good_h2init=jnp.eye(3, dtype=jnp.float32),
        lost=jnp.asarray(False),
        n_lost=jnp.asarray(0, jnp.int32))


def build_shared_multi_step(raft_cfg: RaftConfig, tp: TrackerParams,
                            flow_fn=None):
    """N targets from ONE full-frame flow field (BASELINE config 4: batched
    multi-object tracking with a *shared correlation volume*).

    The window-tracker multi mode (pipeline.MultiTargetTracker) runs N
    independent window pipelines — N RAFT forwards per frame. This mode is
    the other point on the cost curve: ONE full-frame WOFT step (pre-warp by
    the control target's last-good H, one WeightedRAFT forward, one shared
    correlation volume — the single-control discipline of
    ref:YAOF_tracker_single_control.py:83-131 extended to N fits) and a
    vmapped per-target TC-selection + weighted-QR fit, which costs ~1 ms
    for all N targets. Multi-target throughput therefore rides the
    full-frame fps directly: at F fps the mode delivers N*F targets·fr/s.

    Semantics vs N window trackers: all targets share the control target's
    pre-warp, so a secondary target moving very differently from the
    control sees larger flow residuals (the trade the reference's
    "single control" naming concedes). Each target keeps its own
    redetection bookkeeping (h_last, lost, n_lost); target 0 is the
    control and drives the TrackerState ladder exactly as
    ``build_track_step``.

    Returns ``(params, state, masks (N, H*W) bool, h_last (N, 3, 3),
    frame) -> (new_state, new_h_last, hs (N, 3, 3), meta)``; jitted,
    scan-able. ``redetection='always'`` or ``no_local_h`` required (no
    per-target local-fallback RAFT pass — lax.cond under vmap would run
    it for every target)."""
    assert tp.no_local_h or tp.redetection == "always", \
        "shared-flow multi mode has no per-target local fallback"

    def default_flow(params, img1, img2, template_feats=None):
        padder = make_padder(tp.padding_mode, img2.shape)
        if template_feats is None:
            p1, p2 = padder.pad(img1, img2)
            out = weighted_raft_forward(params, raft_cfg, p1, p2)
        else:
            (p2,) = padder.pad(img2)
            out = weighted_raft_forward(params, raft_cfg, None, p2,
                                        template_feats=template_feats)
        flow = padder.unpad(out["flow_up"])
        weights = jax.nn.sigmoid(padder.unpad(out["weights_up"])) \
            if "weights_up" in out else jnp.ones_like(flow[..., :1])
        return flow, weights

    base_flow = flow_fn if flow_fn is not None else default_flow
    sparse_ok = (flow_fn is None and tp.sparse_weights
                 and raft_cfg.variant == "weighted" and not raft_cfg.small
                 and tp.padding_mode == "nopad")

    def step(params, state: TrackerState, masks, h_last, frame):
        H_img, W_img = frame.shape[1:3]
        hw = H_img * W_img

        reset = state.n_lost > tp.no_prewarp_after_n
        last_good = jnp.where(reset, jnp.eye(3, dtype=jnp.float32),
                              state.last_good_h2init)
        prewarped = warp_perspective_fast(
            frame, last_good,
            precision="default" if raft_cfg.precision == "bf16"
            else "highest")

        if sparse_ok:
            fo = weighted_raft_forward(params, raft_cfg, None, prewarped,
                                       template_feats=state.template_feats,
                                       sparse_weight_head=True)
            flow, weights = fo["flow_up"], None
        else:
            flow, weights = base_flow(params, state.template_img, prewarped,
                                      state.template_feats)[:2]

        dst = (jnp.stack(
            [(jnp.arange(hw) % W_img).astype(jnp.float32),
             (jnp.arange(hw) // W_img).astype(jnp.float32)], -1)
            + flow.reshape(hw, 2))
        dst_int = jnp.round(dst).astype(jnp.int32)
        oob = (jnp.any(dst < 0, axis=-1)
               | (dst_int[:, 0] >= W_img) | (dst_int[:, 1] >= H_img))
        in_pw = ~oob
        if tp.use_pw_mask:
            pts = jnp.stack([jnp.clip(dst_int[:, 0], 0, W_img - 1),
                             jnp.clip(dst_int[:, 1], 0, H_img - 1)], -1)
            in_pw &= warp_validity_at(last_good, (H_img, W_img), pts)

        def fit_one(mask_t):
            valid = mask_t & in_pw
            if sparse_ok:
                src_g, dst_g, w_g, sel = _select_tcs_sparse(
                    flow, fo, valid, tp.subsample_n)
            else:
                src_g, dst_g, w_g, sel, _ = _select_tcs(
                    flow, weights, valid, tp.subsample_n)
            H_pw2init = _estimate_h(tp, dst_g, src_g, w_g, sel)   # (1,3,3)
            ok, frac = _success_check(tp, H_pw2init, dst_g, src_g, sel[0:1])
            return compose_h(last_good, H_pw2init[0]), ok, frac

        n_t = masks.shape[0]
        fit_chunk = tp.multi_fit_chunk or n_t
        if n_t <= fit_chunk:
            hs_fit, oks, fracs = jax.vmap(fit_one)(masks)  # (N,3,3),(N,),(N,)
        else:
            # group the target fits: vmap width bounds the sparse
            # weight-head patch temp ((group, Q, 9, 9, C) instead of
            # (N, Q, 9, 9, C)); lax.map serializes the ~1 ms groups.
            # Padding targets are all-False masks — their fits are junk
            # but sliced away below.
            groups = -(-n_t // fit_chunk)
            pad = groups * fit_chunk - n_t
            grouped = jnp.pad(masks, ((0, pad), (0, 0))).reshape(
                groups, fit_chunk, -1)
            hs_fit, oks, fracs = jax.lax.map(
                lambda m: jax.vmap(fit_one)(m), grouped)
            hs_fit = hs_fit.reshape(-1, 3, 3)[:n_t]
            oks = oks.reshape(-1)[:n_t]
            fracs = fracs.reshape(-1)[:n_t]
        # per-target ladder: keep the last good H when a fit fails
        hs = jnp.where(oks[:, None, None], hs_fit, h_last)
        new_h_last = jnp.where(oks[:, None, None], hs_fit, h_last)

        ok0 = oks[0]
        new_state = TrackerState(
            template_img=state.template_img,
            template_feats=state.template_feats,
            template_mask=state.template_mask,
            prev_img=frame,
            prev_h2init=hs[0],
            last_good_h2init=jnp.where(ok0, hs[0], last_good),
            lost=~ok0,
            n_lost=jnp.where(ok0, 0, state.n_lost + 1))
        meta = {"global_H_success": oks, "inlier_frac": fracs}
        return new_state, new_h_last, hs, meta

    jitted = jax.jit(step)
    jitted._raw_step = step
    return jitted


# ---------------------------------------------------------------------------
# host shell (reference-compatible API)
# ---------------------------------------------------------------------------

class WOFTTracker:
    """Host shell with the reference tracker API: numpy BGR in, numpy H out.

    ``config`` is a Config with:
        flow_config: flow wrapper config (model path, iters, ...),
        tracker_params: TrackerParams (or None for canonical WOFT),
        downscale_inputs: optional int.
    (ref:YAOF_tracker_single_control.py:18-57)
    """

    def __init__(self, config):
        self.C = config
        from ..flow.wrapper import RaftFlow
        self.tp = (config.tracker_params
                   if isinstance(config.tracker_params, TrackerParams)
                   else TrackerParams(
                       downscale=int(config.downscale_inputs or 0),
                       padding_mode=str(config.flow_config.padding_mode
                                        or "nopad")))
        if (config.downscale_inputs and not self.tp.downscale):
            # configs may set downscale_inputs alongside explicit
            # tracker_params (the reference's config shape,
            # ref:YAOF_tracker_single_control.py:26-30) — honor it
            from dataclasses import replace
            self.tp = replace(self.tp,
                              downscale=int(config.downscale_inputs))
        # the reference's L5->L3 seam: config selects the wrapper class
        # (ref:YAOF_tracker_single_control.py:23 config.flow_config.of_class)
        of_class = config.flow_config.of_class or RaftFlow
        self._external = of_class is not RaftFlow
        self.flower = of_class(config.flow_config)
        if self._external:
            self._step = build_track_step(RaftConfig(), self.tp,
                                          flow_fn=self.flower.make_flow_fn())
        else:
            self._step = build_track_step(self.flower.cfg, self.tp)
        self.state = None
        self._fast_forward = None

    def _prep(self, img_bgr):
        import cv2
        if self.tp.downscale:
            img_bgr = cv2.resize(img_bgr, None, fx=1 / self.tp.downscale,
                                 fy=1 / self.tp.downscale)
        try:                     # fused native channel-swap + f32 convert
            import woft_native
            rgb = woft_native.bgr_to_rgb_f32(np.ascontiguousarray(img_bgr))
        except ImportError:
            rgb = img_bgr[:, :, ::-1].astype(np.float32)
        return img_bgr, jnp.asarray(rgb)[None]

    def init(self, img, mask, img_identifier=None):
        import cv2
        if self.tp.downscale:
            mask = cv2.resize(mask, None, fx=1 / self.tp.downscale,
                              fy=1 / self.tp.downscale)
        img_small, device_img = self._prep(img)
        # big frames: dispatch the local fallback from the host — the TPU
        # runtime rejects two full-RAFT branches in one lax.cond >=~720p
        if (not self.tp.no_local_h and not self.tp.host_fallback
                and self.tp.redetection == "inliers"
                and img_small.shape[0] * img_small.shape[1] >= 400_000):
            from dataclasses import replace
            self.tp = replace(self.tp, host_fallback=True)
            if self._external:
                self._step = build_track_step(
                    RaftConfig(), self.tp,
                    flow_fn=self.flower.make_flow_fn())
            else:
                self._step = build_track_step(self.flower.cfg, self.tp)
        self.np_template_img = np.ascontiguousarray(img_small)   # BGR host
        self.np_prev_img = self.np_template_img
        self.np_template_mask = np.asarray(mask)
        contours, _ = cv2.findContours(np.uint8(mask > 0), cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_NONE)
        assert len(contours) == 1, "template mask must be one blob"
        self.template_contour = contours[0][:, 0, :].T          # (2, N)

        if self._external:
            self.state = tracker_init_state(
                self.flower.params, RaftConfig(), self.tp,
                device_img, jnp.asarray(mask > 0), encode=False)
        else:
            self.state = tracker_init_state(
                self.flower.params, self.flower.cfg, self.tp,
                device_img, jnp.asarray(mask > 0))
        self._fast_forward = None

    def set_fast_meta(self, meta):
        """Re-inject a previously computed result (resume support,
        ref:YAOF:49-55)."""
        if self.tp.downscale:
            raise NotImplementedError(
                "Fast-forward incompatible with input downscaling.")
        self._fast_forward = meta

    def track(self, input_img, debug=False, img_identifier=None):
        if self._fast_forward is not None:
            meta = self._fast_forward
            H = np.asarray(meta.estim_H_current2template)
            _, device_img = self._prep(input_img)
            eye_state = self.state
            self.state = TrackerState(
                template_img=eye_state.template_img,
                template_feats=eye_state.template_feats,
                template_mask=eye_state.template_mask,
                prev_img=device_img,
                prev_h2init=jnp.asarray(H, jnp.float32),
                last_good_h2init=jnp.asarray(H, jnp.float32),
                lost=jnp.asarray(False),
                n_lost=jnp.asarray(0, jnp.int32))
            self._fast_forward = None
            return H, meta

        img_small, device_img = self._prep(input_img)
        self.state, H_dev, meta_dev = self._step(self.flower.params,
                                                 self.state, device_img)
        H = np.asarray(H_dev, np.float64)
        meta = SimpleNamespace(
            **{k: np.asarray(v) for k, v in meta_dev.items()})
        meta.estim_H_current2template = H.copy()

        if debug:
            meta.debug_vis = self._debug_vis(
                np.ascontiguousarray(img_small),
                np.asarray(meta.H_global_cur2init, np.float64),
                np.asarray(meta.last_good_H2init, np.float64))
        self.np_prev_img = np.ascontiguousarray(img_small)

        if self.tp.downscale:
            # compensate the output H for the input downscale (ref:YAOF:280-283)
            from ..geometry.homography import np_compose_h
            s = float(self.tp.downscale)
            H_down = np.diag([1 / s, 1 / s, 1.0])
            H_up = np.diag([s, s, 1.0])
            H = np_compose_h(H_down, np.asarray(H_dev, np.float64), H_up)
        return H, meta

    def _debug_vis(self, input_bgr, H_global, last_good):
        """Render the reference's ``track(debug=True)`` overlays headlessly
        (ref:YAOF_tracker_single_control.py:209-265): weight-coloured TC
        arrows on the prewarped pair, local-flow arrows, alignment blends,
        template TC scatter. Returns {name: BGR image} — the demo writes
        them to disk (no cv2.imshow: CI has no display)."""
        import cv2
        from ..utils import vis as vis_utils

        Hh, Ww = input_bgr.shape[:2]
        prewarped = cv2.warpPerspective(input_bgr, last_good, (Ww, Hh))

        # weight-coloured TC arrows, masked to the template (extra flow
        # pass with numpy_out, exactly like the reference)
        pw = self.flower.compute_flow(self.np_template_img, prewarped,
                                      mode="flow", numpy_out=True,
                                      do_sigmoid=True)
        pw_flow = np.transpose(pw[0], (1, 2, 0))            # (H, W, 2)
        pw_weights = pw[1] if pw[1] is not None else np.ones((Hh, Ww))
        colors = vis_utils.cv2_colormap(pw_weights, vmin=0, vmax=1)
        alpha = (self.np_template_mask.reshape(-1, 1) > 0).astype(np.uint8)
        arrow_color = np.concatenate(
            [colors.reshape(-1, 3), alpha * 255], axis=1)
        vis_pw_flow = vis_utils.vis_flow_align(
            pw_flow, self.np_template_img, prewarped, grid_sz=10,
            arrow_color=arrow_color, pt_radius=3, show_flow=False)

        # local (prev -> current) flow arrows
        lf = self.flower.compute_flow(self.np_prev_img, input_bgr,
                                      mode="flow", numpy_out=True)
        local_flow = np.transpose(lf[0], (1, 2, 0))
        vis_local_flow = vis_utils.vis_flow_align(
            local_flow, self.np_prev_img, input_bgr, grid_sz=30)

        # alignment blends + composition
        local_align = vis_utils.vis_alignment_plain(self.np_prev_img,
                                                    input_bgr)
        prewarp_align = vis_utils.vis_alignment_plain(self.np_template_img,
                                                      prewarped)
        afterwarped = cv2.warpPerspective(input_bgr, H_global, (Ww, Hh),
                                          flags=cv2.INTER_LINEAR)
        afterwarp_align = vis_utils.vis_alignment_plain(
            self.np_template_img, afterwarped)
        composition = vis_utils.tile(vis_utils.griddify(
            vis_utils.name_fig(
                [local_align, prewarp_align, afterwarp_align],
                ["local flow", "prewarped", "afterwarped"]), cols=1))

        # template TC scatter
        canvas = self.np_template_img.copy()
        ys, xs = np.where(self.np_template_mask > 0)
        for i in range(0, len(xs), max(1, len(xs) // 500)):
            cv2.circle(canvas, (int(xs[i]), int(ys[i])), radius=2,
                       color=(255, 255, 255), thickness=-1)

        return {"pw_flow": vis_pw_flow, "local_flow": vis_local_flow,
                "composition": composition, "template_points": canvas}
