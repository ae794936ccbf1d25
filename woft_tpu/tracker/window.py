"""Search-window WOFT variant (fixed-size crops, resolution-independent).

TPU-native rework of ref:pytracking/tracker/WOFT_window.py: the reference
crops template/current to a margin-padded target bbox at native scale
(variable shapes); XLA wants static shapes, so this variant warps the search
region into a FIXED window (default 256x256) with a bbox->window homography
and runs the whole flow+fit pipeline inside the window:

- per-frame cost is independent of the video resolution (the 1080p/4K
  scaling path; the all-pairs volume is (S/8)^4 regardless of input size),
- the fitted window-space homography is un-cropped exactly by conjugating
  with the crop transforms (ref:WOFT_window.py:420-427 'H_undo_crop'),
- the search bbox tracks the previous warp of the template bbox with the
  reference's margin + min-size rules (ref:WOFT_window.py:37-44).

Host side picks the (float) crop homographies per frame; the device step is
one jitted function of static window size.
"""

import logging
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.bbox import Bbox, h_bbox2bbox, project_bbox
from ..geometry.homography import np_compose_h
from .woft import TrackerParams, build_track_step, tracker_init_state, \
    TrackerState

logger = logging.getLogger(__name__)


def _shift_into(box, frame_box):
    """Translate ``box`` to lie inside ``frame_box`` where it fits (partial
    shift when larger than the frame) — keeps aspect-grown search regions
    on-image without re-distorting them."""
    dx = max(0.0, frame_box.tl_x - box.tl_x) \
        - max(0.0, box.br_x - frame_box.br_x)
    dy = max(0.0, frame_box.tl_y - box.tl_y) \
        - max(0.0, box.br_y - frame_box.br_y)
    if box.w > frame_box.w:
        dx /= 2
    if box.h > frame_box.h:
        dy /= 2
    return Bbox.from_xywh((box.tl_x + dx, box.tl_y + dy, box.w, box.h))


class WOFTWindowTracker:
    """Fixed-window WOFT tracker with the reference init/track API.

    config additions: ``window_size`` (default 256), ``window_margin``
    (bbox margin fraction, default 0.5), ``min_window_px`` (min source
    bbox size, default 160 ~ the reference's 8*20, ref:WOFT_window.py:41).

    ``window_native_scale = True`` switches to the native-resolution crop
    mode — the capability twin of the reference's variable-size crops
    (ref:WOFT_window.py:37-44 fixes a native-scale search bbox per
    SEQUENCE): the window dims follow the margin-padded template bbox
    (snapped to ``window_snap_px`` to bound the number of distinct
    compile shapes), capped at ``window_max_px``. The crop scale is then
    exactly isotropic and exactly 1 whenever the native region fits the
    cap — a lossless crop for small targets, where the fixed-budget mode
    would resample. The per-frame search region keeps the SAME fixed
    source size, re-centered on the current estimate (a superset of the
    reference, whose search bbox never moves).
    """

    def __init__(self, config):
        self.C = config
        from ..flow.wrapper import RaftFlow
        self.flower = RaftFlow(config.flow_config)
        self.S = int(config.window_size or 256)
        self.margin = float(config.window_margin or 0.5)
        self.min_px = int(config.min_window_px or 160)
        self.native_scale = bool(config.window_native_scale)
        self.max_px = int(config.window_max_px or 2 * self.S)
        self.snap_px = int(config.window_snap_px or 32)
        if self.snap_px % 8:
            raise ValueError("window_snap_px must be a multiple of 8 "
                             "(RAFT feature stride)")
        # isotropic crops by default: the window takes the template bbox's
        # aspect at init (area ~= window_size^2, dims /8), so the
        # bbox->window resample is undistorted at the best possible scale.
        # ``window_aniso_crop = True`` opts out (fixed square window fed by
        # anisotropically squeezed crops).
        self.iso_crop = not bool(config.window_aniso_crop)
        self.win_hw = (self.S, self.S)      # chosen per sequence in init()
        base_tp = (config.tracker_params
                   if isinstance(config.tracker_params, TrackerParams)
                   else TrackerParams())
        # window contents are already aligned by the crop: the outer
        # pre-warp state machine still runs, but on window-sized images
        self.tp = base_tp
        self._step = build_track_step(self.flower.cfg, self.tp)
        self.state = None

    # ------------------------------------------------------------------

    def _crop(self, img_bgr, h_crop):
        """Warp a full frame into the fixed window (device)."""
        from ..ops.warp import warp_perspective
        rgb = jnp.asarray(img_bgr[:, :, ::-1].astype(np.float32))[None]
        return warp_perspective(rgb, jnp.asarray(h_crop, jnp.float32),
                                out_shape=self.win_hw)

    def _search_bbox(self, h_init2cur, frame_shape):
        """Project the template bbox into the current frame and pad it.

        Follows the reference order (ref:WOFT_window.py:37-44): margins,
        intersect with the frame (never crop beyond the image — out-of-frame
        content wastes window resolution), then min-size; the aspect growth
        is translated back into the frame when it fits."""
        box = project_bbox(self.template_bbox, h_init2cur)
        frame_box = Bbox.from_xywh((0, 0, frame_shape[1], frame_shape[0]))
        if self.native_scale:
            # fixed-size native-scale search region re-centered on the
            # current estimate: the crop scale stays the exact isotropic
            # per-sequence constant (ref:WOFT_window.py:37-44 keeps the
            # bbox itself fixed; re-centering is a strict superset). The
            # template bbox already carries the margins in this mode.
            inter = box.intersection(frame_box)
            if inter.w < 8 or inter.h < 8:   # lost far outside
                return frame_box
            cx, cy = box.get_center()
            sw, sh = self._src_wh
            return _shift_into(
                Bbox.from_xywh((cx - sw / 2, cy - sh / 2, sw, sh)),
                frame_box)
        box = box.with_margins(self.margin)
        inter = box.intersection(frame_box)
        if inter.w < 8 or inter.h < 8:   # lost far outside: search everywhere
            return frame_box
        box = inter.with_margins_min_size(self.min_px)
        if self.iso_crop:
            box = box.with_aspect(self.win_hw[1] / self.win_hw[0])
            box = _shift_into(box, frame_box)
        return box

    # ------------------------------------------------------------------

    def init(self, img, mask, img_identifier=None):
        import cv2
        frame_box = Bbox.from_xywh((0, 0, img.shape[1], img.shape[0]))
        self.template_bbox = Bbox.from_mask(mask > 0).with_margins(self.margin)
        self.template_bbox = self.template_bbox.intersection(frame_box)
        if self.native_scale:
            # per-sequence static dims at the native crop scale
            # (ref:WOFT_window.py:37-44: margin-padded bbox, min 8*20 px,
            # native resolution). s is the exact isotropic crop scale;
            # snapping GROWS the source region (ceil) so content is never
            # cropped away by the shape grid, and s stays exact because
            # the source box is derived back from the snapped dims.
            box = self.template_bbox.with_margins_min_size(self.min_px)
            s = min(1.0, self.max_px / max(box.w, box.h))
            snap = self.snap_px
            ww = int(np.clip(np.ceil(box.w * s / snap) * snap, 64,
                             self.max_px))
            wh = int(np.clip(np.ceil(box.h * s / snap) * snap, 64,
                             self.max_px))
            self.win_hw = (wh, ww)
            self._src_wh = (ww / s, wh / s)
            cx, cy = box.get_center()
            self.template_bbox = _shift_into(
                Bbox.from_xywh((cx - self._src_wh[0] / 2,
                                cy - self._src_wh[1] / 2,
                                self._src_wh[0], self._src_wh[1])),
                frame_box)
        elif self.iso_crop:
            # rectangular window matching the template aspect: same pixel
            # area as window_size^2, dims multiples of 8, aspect clipped
            aspect = np.clip(self.template_bbox.w
                             / max(self.template_bbox.h, 1.0), 0.4, 2.5)
            ww = int(np.clip(round(self.S * np.sqrt(aspect) / 8) * 8, 64,
                             4 * self.S))
            wh = int(np.clip(round(self.S * self.S / ww / 8) * 8, 64,
                             4 * self.S))
            self.win_hw = (wh, ww)
            self.template_bbox = _shift_into(
                self.template_bbox.with_aspect(ww / wh), frame_box)
        self.h_tmpl_crop = h_bbox2bbox(
            self.template_bbox,
            Bbox.from_xywh((0, 0, self.win_hw[1], self.win_hw[0])))

        tmpl_window = self._crop(img, self.h_tmpl_crop)
        mask_window = cv2.warpPerspective(
            np.uint8(mask > 0), self.h_tmpl_crop,
            (self.win_hw[1], self.win_hw[0]),
            flags=cv2.INTER_NEAREST) > 0

        self.state = tracker_init_state(
            self.flower.params, self.flower.cfg, self.tp,
            tmpl_window, jnp.asarray(mask_window))
        self.h_cur2init = np.eye(3)
        self.h_last_good = np.eye(3)
        self.h_prev = np.eye(3)
        self._prev_crop = self.h_tmpl_crop
        self.np_template_mask = np.asarray(mask)

    def _to_window(self, h_full, h_crop):
        """Express a full-frame cur2init H in window coordinates:
        cur window -> full cur -> full init -> template window."""
        return np_compose_h(np.linalg.inv(h_crop), h_full, self.h_tmpl_crop)

    def track(self, input_img, debug=False, img_identifier=None):
        # search region around the previous estimate
        search = self._search_bbox(np.linalg.inv(self.h_last_good),
                                   input_img.shape)
        h_cur_crop = h_bbox2bbox(
            search, Bbox.from_xywh((0, 0, self.win_hw[1], self.win_hw[0])))
        cur_window = self._crop(input_img, h_cur_crop)

        # crops change per frame, so the inner state's homography history
        # must be re-expressed in the new window's coordinates
        s = self.state
        self.state = TrackerState(
            template_img=s.template_img,
            template_feats=s.template_feats,
            template_mask=s.template_mask,
            prev_img=s.prev_img,
            prev_h2init=jnp.asarray(
                self._to_window(self.h_prev, self._prev_crop), jnp.float32),
            last_good_h2init=jnp.asarray(
                self._to_window(self.h_last_good, h_cur_crop), jnp.float32),
            lost=s.lost,
            n_lost=s.n_lost)

        self.state, h_win, meta_dev = self._step(self.flower.params,
                                                 self.state, cur_window)
        h_win = np.asarray(h_win, np.float64)

        # un-crop (ref:WOFT_window.py:420-427): window H maps
        # cur_window -> tmpl_window; conjugate with the crop transforms
        h_cur2init = np_compose_h(h_cur_crop, h_win,
                                  np.linalg.inv(self.h_tmpl_crop))

        meta = SimpleNamespace(
            **{k: np.asarray(v) for k, v in meta_dev.items()})
        ok = bool(meta.global_H_success)
        self.h_cur2init = h_cur2init
        self.h_prev = h_cur2init
        self._prev_crop = h_cur_crop
        if ok:
            self.h_last_good = h_cur2init
        elif int(meta.N_lost) > self.tp.no_prewarp_after_n:
            self.h_last_good = np.eye(3)       # full-frame redetection

        meta.estim_H_current2template = h_cur2init.copy()
        meta.search_bbox = search.as_xywh()
        return h_cur2init, meta
