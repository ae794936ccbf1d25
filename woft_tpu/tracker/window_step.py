"""Fully device-resident search-window tracking step.

Everything — search-bbox selection, fixed-window crop, window-space WOFT
pipeline, homography un-crop, state update — runs inside one jitted step, so
a video can be tracked with ``lax.scan`` over pre-staged frames with zero
per-frame host round trips (the production streaming path; the host-shell
variant in tracker/window.py trades this for the reference's imperative
API).

Window-coordinate bookkeeping:
- ``h_tmpl_crop`` (static per sequence): template frame -> template window.
- per frame, the search bbox is the projection of the template bbox through
  ``inv(h_last_good)`` with margin + min-size rules
  (ref:pytracking/tracker/WOFT_window.py:37-44), intersected with the frame.
- the inner pipeline sees ``cur window -> template window`` homographies;
  full-frame H is recovered by conjugation (ref:WOFT_window.py:420-427).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.raft import RaftConfig, weighted_raft_forward, encode_template
from ..ops.pad import make_padder
from ..ops.warp import (warp_axis_aligned, warp_perspective,
                        warp_validity_at)
from .woft import (TrackerParams, _estimate_h, _select_tcs,
                   _select_tcs_sparse, _success_check)


@dataclass(frozen=True)
class WindowParams:
    size: "int | tuple" = 256   # fixed window resolution: int (square) or
    #                             (H, W) — rectangular windows let the crop
    #                             match the target's aspect (see
    #                             window_params_for_mask)
    margin: float = 0.5      # bbox margin fraction
    min_px: float = 160.0    # min source bbox size (ref: 8*20)
    square: bool = True      # grow the source bbox to the window's aspect
    #                          so the bbox->window resample is isotropic
    #                          (the reference crops at native scale and
    #                          never distorts, WOFT_window.py:37-44)

    @property
    def shape(self):
        """(H, W) window shape."""
        if isinstance(self.size, tuple):
            return self.size
        return (self.size, self.size)


def window_params_for_mask(mask, size=256, margin=0.5, min_px=160.0,
                           max_aspect=2.5):
    """WindowParams whose rectangular window matches the target's aspect:
    pixel area ~= size^2, dims multiples of 8, isotropic crops."""
    import numpy as np
    ys, xs = np.where(np.asarray(mask))
    w = xs.max() - xs.min() + 1.0
    h = ys.max() - ys.min() + 1.0
    aspect = float(np.clip(w / max(h, 1.0), 1.0 / max_aspect, max_aspect))
    ww = int(np.clip(round(size * np.sqrt(aspect) / 8) * 8, 64, 4 * size))
    wh = int(np.clip(round(size * size / ww / 8) * 8, 64, 4 * size))
    return WindowParams(size=(wh, ww), margin=margin, min_px=min_px)


def _bbox_to_window_h(x0, y0, w, h, shape):
    """Closed-form h_bbox2bbox((x0, y0, w, h) -> (0, 0, Sw, Sh)) on device
    (ref:geom_utils.py:142-166)."""
    Sh, Sw = shape
    sx = Sw / w
    sy = Sh / h
    z = jnp.zeros(())
    return jnp.stack([
        jnp.stack([sx, z, -sx * x0]),
        jnp.stack([z, sy, -sy * y0]),
        jnp.stack([z, z, jnp.ones(())]),
    ])


def _search_crop_h(h_last_good, tmpl_corners, frame_hw, wp: WindowParams):
    """Device twin of the host search-bbox logic: project template corners
    through inv(h_last_good), pad, clamp, emit the crop homography."""
    shape = wp.shape
    inv = jnp.linalg.inv(h_last_good)
    ones = jnp.ones((4, 1), tmpl_corners.dtype)
    proj = jnp.concatenate([tmpl_corners, ones], axis=1) @ inv.T   # (4,3)
    proj = proj[:, :2] / proj[:, 2:3]
    x_min = jnp.min(proj[:, 0])
    x_max = jnp.max(proj[:, 0])
    y_min = jnp.min(proj[:, 1])
    y_max = jnp.max(proj[:, 1])
    w = x_max - x_min + 1.0
    h = y_max - y_min + 1.0
    H_img, W_img = frame_hw

    # reference order (ref:WOFT_window.py:37-44): margins, intersect with
    # the frame, then min-size
    x_min = x_min - wp.margin * w
    x_max = x_max + wp.margin * w
    y_min = y_min - wp.margin * h
    y_max = y_max + wp.margin * h
    x_min_c = jnp.maximum(x_min, 0.0)
    y_min_c = jnp.maximum(y_min, 0.0)
    x_max_c = jnp.minimum(x_max, W_img - 1.0)
    y_max_c = jnp.minimum(y_max, H_img - 1.0)
    # keep the unclamped box when the intersection is degenerate (box fully
    # off-frame); the `bad` fallback below then searches the whole frame
    use = (x_max_c - x_min_c >= 8.0) & (y_max_c - y_min_c >= 8.0)
    x_min = jnp.where(use, x_min_c, x_min)
    x_max = jnp.where(use, x_max_c, x_max)
    y_min = jnp.where(use, y_min_c, y_min)
    y_max = jnp.where(use, y_max_c, y_max)

    # min-size rule (ref:Bbox.with_margins_min_size, geom_utils.py:106-119)
    w = x_max - x_min + 1.0
    h = y_max - y_min + 1.0
    missing = jnp.maximum(jnp.maximum(wp.min_px - w, 0.0) / (2.0 * w),
                          jnp.maximum(wp.min_px - h, 0.0) / (2.0 * h))
    x_min = x_min - missing * w
    x_max = x_max + missing * w
    y_min = y_min - missing * h
    y_max = y_max + missing * h
    if wp.square:
        # grow to the window's aspect (isotropic bbox->window resample),
        # then translate back into the frame where it fits
        aspect = shape[1] / shape[0]
        cx = (x_min + x_max) / 2
        cy = (y_min + y_max) / 2
        half_w = jnp.maximum(x_max - x_min,
                             aspect * (y_max - y_min)) / 2
        half_h = half_w / aspect
        x_min, x_max = cx - half_w, cx + half_w
        y_min, y_max = cy - half_h, cy + half_h
        dx = (jnp.maximum(-x_min, 0.0)
              - jnp.maximum(x_max - (W_img - 1.0), 0.0))
        dy = (jnp.maximum(-y_min, 0.0)
              - jnp.maximum(y_max - (H_img - 1.0), 0.0))
        dx = jnp.where(2 * half_w > W_img, dx / 2, dx)
        dy = jnp.where(2 * half_h > H_img, dy / 2, dy)
        x_min, x_max = x_min + dx, x_max + dx
        y_min, y_max = y_min + dy, y_max + dy
    # degenerate/escaped box -> search the whole frame
    bad = ((x_max - x_min < 8.0) | (y_max - y_min < 8.0)
           | (x_max < 0) | (y_max < 0)
           | (x_min > W_img - 1.0) | (y_min > H_img - 1.0)
           | ~jnp.isfinite(x_min) | ~jnp.isfinite(y_max))
    x_min = jnp.where(bad, 0.0, x_min)
    y_min = jnp.where(bad, 0.0, y_min)
    x_max = jnp.where(bad, W_img - 1.0, x_max)
    y_max = jnp.where(bad, H_img - 1.0, y_max)
    return _bbox_to_window_h(x_min, y_min, x_max - x_min + 1.0,
                             y_max - y_min + 1.0, shape)


def window_init_state(params, raft_cfg: RaftConfig, tp: TrackerParams,
                      wp: WindowParams, frame, mask, encode=True):
    """Initial window-tracker state from the first full frame.

    frame: (1, H, W, 3) f32 RGB; mask: (H, W) bool. Returns a state dict;
    the (static) template crop homography is computed on host from the mask
    bbox and stored in the state as a device constant."""
    import numpy as np
    Sh, Sw = wp.shape
    mask_np = np.asarray(mask)
    ys, xs = np.where(mask_np)
    x0, x1 = float(xs.min()), float(xs.max())
    y0, y1 = float(ys.min()), float(ys.max())
    w = x1 - x0 + 1
    h = y1 - y0 + 1
    x0 -= wp.margin * w
    y0 -= wp.margin * h
    w *= 1 + 2 * wp.margin
    h *= 1 + 2 * wp.margin
    # intersect with the frame (ref:WOFT_window.py:40): off-image content
    # would waste window resolution
    H_img, W_img = frame.shape[1:3]
    x1, y1 = x0 + w, y0 + h
    x0, y0 = max(x0, 0.0), max(y0, 0.0)
    w = min(x1, W_img - 1.0) - x0
    h = min(y1, H_img - 1.0) - y0
    if wp.square:
        aspect = Sw / Sh
        nw = max(w, aspect * h)
        nh = nw / aspect
        x0 -= (nw - w) / 2
        y0 -= (nh - h) / 2
        w, h = nw, nh
        # translate back into the frame where it fits
        dx = max(-x0, 0.0) - max(x0 + w - (W_img - 1.0), 0.0)
        dy = max(-y0, 0.0) - max(y0 + h - (H_img - 1.0), 0.0)
        x0 += dx / 2 if w > W_img else dx
        y0 += dy / 2 if h > H_img else dy
    h_tmpl_crop = np.array([[Sw / w, 0, -Sw / w * x0],
                            [0, Sh / h, -Sh / h * y0],
                            [0, 0, 1.0]], np.float32)
    tmpl_corners = np.array([[x0, y0], [x0 + w - 1, y0],
                             [x0 + w - 1, y0 + h - 1], [x0, y0 + h - 1]],
                            np.float32)

    # axis-aligned by construction -> separable matmul resample (also
    # avoids grid_sample's packed-source path, which OOM'd on 4K frames)
    tmpl_window = warp_axis_aligned(frame, jnp.asarray(h_tmpl_crop),
                                    out_shape=(Sh, Sw))
    mask_window = warp_perspective(
        jnp.asarray(mask_np[None, :, :, None].astype(np.float32)),
        jnp.asarray(h_tmpl_crop), out_shape=(Sh, Sw), mode="nearest")
    if encode:
        padder = make_padder(tp.padding_mode, tmpl_window.shape)
        (padded,) = padder.pad(tmpl_window)
        feats = encode_template(params, raft_cfg, padded)
    else:
        feats = None

    return {
        "h_tmpl_crop": jnp.asarray(h_tmpl_crop),
        "tmpl_corners": jnp.asarray(tmpl_corners),
        "tmpl_window": tmpl_window,
        "tmpl_feats": feats,
        "tmpl_mask_window": mask_window[0, :, :, 0] > 0,
        "prev_window": jnp.copy(tmpl_window),
        "h_prev_win2tmplwin": jnp.eye(3),     # prev window -> template window
        "h_prev_crop": jnp.asarray(h_tmpl_crop),
        "h_last_good": jnp.eye(3),            # full-frame cur2init
        "h_prev_full": jnp.eye(3),
        "lost": jnp.asarray(False),
        "n_lost": jnp.asarray(0, jnp.int32),
    }


def build_window_track_step(raft_cfg: RaftConfig, tp: TrackerParams,
                            wp: WindowParams, flow_fn=None):
    """(params, state, frame (1,H,W,3)) -> (state, H_cur2init, meta);
    fully jitted, scan-able."""
    Sh, Sw = wp.shape

    def run_flow(params, img1, img2, template_feats=None):
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

    flow = flow_fn if flow_fn is not None else run_flow
    # sparse weight-head path (see tracker/woft.py): head + convex upsample
    # only at the cells the 500-point solver consumes
    sparse_ok = (flow_fn is None and tp.sparse_weights
                 and raft_cfg.variant == "weighted" and not raft_cfg.small
                 and tp.padding_mode == "nopad")

    def step(params, state, frame):
        # Accept uint8 uploads (4x fewer bytes over a slow host link — a 4K
        # f32 frame is 95 MB through the tunnel) and cast in-graph. The
        # trace-time branch keeps the jaxpr — and hence the compile cache —
        # identical for float32 callers.
        if frame.dtype != jnp.float32:
            frame = frame.astype(jnp.float32)
        frame_hw = frame.shape[1:3]
        hw = Sh * Sw
        # pre-warp reset escalation (ref:YAOF:78-79)
        reset = state["n_lost"] > tp.no_prewarp_after_n
        h_last_good = jnp.where(reset, jnp.eye(3, dtype=jnp.float32),
                                state["h_last_good"])

        h_crop = _search_crop_h(h_last_good, state["tmpl_corners"],
                                frame_hw, wp)
        # h_crop is scale+translate by construction (_bbox_to_window_h):
        # extract the search window as two separable one-hot matmuls (MXU)
        # instead of a 4-corner gather — the gather balloons under the
        # multi-target vmap (10.6 ms/step at x8, RESULTS.md r4 xprof).
        window = warp_axis_aligned(frame, h_crop, out_shape=(Sh, Sw))
        # window-space prior: cur window -> template window
        h_crop_inv = jnp.linalg.inv(h_crop)
        h_prior = state["h_tmpl_crop"] @ (h_last_good @ h_crop_inv)
        h_prior = h_prior / h_prior[2, 2]

        # pre-warp the window by the prior
        prewarped = warp_perspective(window, h_prior)

        if sparse_ok:
            wfo = weighted_raft_forward(params, raft_cfg, None, prewarped,
                                        template_feats=state["tmpl_feats"],
                                        sparse_weight_head=True)
            wflow, wweights = wfo["flow_up"], None
        else:
            wflow, wweights = flow(params, state["tmpl_window"], prewarped,
                                   state["tmpl_feats"])

        dst = (jnp.stack(
            [(jnp.arange(hw) % Sw).astype(jnp.float32),
             (jnp.arange(hw) // Sw).astype(jnp.float32)], -1)
            + wflow.reshape(hw, 2))
        dst_int = jnp.round(dst).astype(jnp.int32)
        oob = (jnp.any(dst < 0, axis=-1)
               | (dst_int[:, 0] >= Sw) | (dst_int[:, 1] >= Sh))
        in_pw = ~oob
        if tp.use_pw_mask:
            # pre-warp + in-frame validity evaluated analytically AT the
            # dst points (no boolean-mask gather; see tracker/woft.py)
            pts = jnp.stack([jnp.clip(dst_int[:, 0], 0, Sw - 1),
                             jnp.clip(dst_int[:, 1], 0, Sh - 1)], -1)
            in_pw &= warp_validity_at(h_prior, (Sh, Sw), pts)
            in_pw &= warp_validity_at(h_prior @ h_crop, frame_hw, pts)
        valid = state["tmpl_mask_window"].reshape(hw) & in_pw

        if sparse_ok:
            src_g, dst_g, w_g, sel = _select_tcs_sparse(wflow, wfo, valid,
                                                        tp.subsample_n)
        else:
            src_g, dst_g, w_g, sel, _ = _select_tcs(wflow, wweights, valid,
                                                    tp.subsample_n)
        h_pw2tmpl = _estimate_h(tp, dst_g, src_g, w_g, sel)
        ok, inlier_frac = _success_check(tp, h_pw2tmpl, dst_g, src_g,
                                         sel[0:1])

        # window-space estimate: cur window -> template window
        h_win = h_pw2tmpl[0] @ h_prior
        h_win = h_win / h_win[2, 2]
        # un-crop to the full frame (ref:WOFT_window.py:420-427)
        h_full = jnp.linalg.inv(state["h_tmpl_crop"]) @ (h_win @ h_crop)
        h_full = h_full / h_full[2, 2]

        # local fallback: prev window -> cur window flow chained through
        # the previous window estimate (ref:YAOF:171-207)
        def local_branch(_):
            # valid where the previous window saw the template: warp the
            # template-window mask into prev-window coordinates
            prev_mask = warp_perspective(
                state["tmpl_mask_window"][None, :, :, None].astype(
                    jnp.float32),
                jnp.linalg.inv(state["h_prev_win2tmplwin"]),
                mode="nearest")
            lvalid = prev_mask.reshape(hw) > 0
            if sparse_ok:
                lfo = weighted_raft_forward(params, raft_cfg,
                                            state["prev_window"], window,
                                            sparse_weight_head=True)
                lsrc, ldst, lw, lsel = _select_tcs_sparse(
                    lfo["flow_up"], lfo, lvalid, tp.subsample_n)
            else:
                lflow, lweights = flow(params, state["prev_window"], window)
                lsrc, ldst, lw, lsel, _ = _select_tcs(lflow, lweights,
                                                      lvalid,
                                                      tp.subsample_n)
            hf = _estimate_h(tp, ldst, lsrc, lw, lsel)[0]  # cur->prev window
            # full chain: cur frame -> cur window -> prev window ->
            #             prev frame -> init
            h_full_l = (state["h_prev_full"]
                        @ jnp.linalg.inv(state["h_prev_crop"])
                        @ hf @ h_crop)
            h_full_l = h_full_l / h_full_l[2, 2]
            return jnp.where(jnp.all(jnp.isfinite(h_full_l)), h_full_l,
                             state["h_prev_full"])

        if tp.no_local_h:
            h_out = h_full
        else:
            h_out = jax.lax.cond(ok, lambda _: h_full, local_branch,
                                 operand=None)

        new_state = dict(
            state,
            prev_window=window,
            h_prev_win2tmplwin=(state["h_tmpl_crop"] @ h_out
                                @ h_crop_inv),
            h_prev_crop=h_crop,
            h_last_good=jnp.where(ok, h_out, h_last_good),
            h_prev_full=h_out,
            lost=~ok,
            n_lost=jnp.where(ok, 0, state["n_lost"] + 1),
        )
        meta = {"global_H_success": ok, "inlier_frac": inlier_frac,
                "lost": ~ok, "N_lost": new_state["n_lost"],
                "h_crop": h_crop}
        return new_state, h_out, meta

    jitted = jax.jit(step, donate_argnums=(1,))
    jitted._raw_step = step   # un-jitted body: vmap-over-targets re-wrapping
    return jitted