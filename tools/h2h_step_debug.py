#!/usr/bin/env python
"""Frame-2 step-level diff between our tracker and the reference tracker:
dump the actual masked TC sets, weights and fitted H from BOTH real
pipelines (no subsampling) and attribute the corner disagreement.

Usage: python tools/h2h_step_debug.py
"""

import sys
from pathlib import Path

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from headtohead import (install_cpu_shim, install_kornia_stub,  # noqa: E402
                        load_frames, rect_mask)


def corners_of(Hm, bbox):
    x, y, w, h = bbox
    c = np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]],
                 np.float64)
    p = np.concatenate([c, np.ones((4, 1))], 1).T
    q = np.linalg.inv(Hm) @ p
    return (q[:2] / q[2:]).T


def main():
    import cv2
    frames, _ = load_frames(str(REFERENCE / "demo" / "V25_2"), 2)
    frames = [cv2.resize(f, None, fx=0.5, fy=0.5) for f in frames]
    H_img, W_img = frames[0].shape[:2]
    bbox = (W_img // 4, H_img // 4, W_img // 2, H_img // 2)
    mask = rect_mask(frames[0].shape, bbox)

    # ---------------- ours (real pipeline pieces, no subsample) ----------
    import jax.numpy as jnp
    from woft_tpu.config import load_config
    from woft_tpu.flow.wrapper import RaftFlow
    conf = load_config(REPO / "woft_tpu" / "configs" / "WOFT.py")
    fl = RaftFlow(conf.flow_config)
    from woft_tpu.models.raft import weighted_raft_forward, encode_template
    from woft_tpu.geometry.homography import find_homography_wls_qr

    i1 = jnp.asarray(frames[0][:, :, ::-1].astype(np.float32))[None]
    i2 = jnp.asarray(frames[1][:, :, ::-1].astype(np.float32))[None]
    feats = encode_template(fl.params, fl.cfg, i1)
    out = weighted_raft_forward(fl.params, fl.cfg, None, i2,
                                template_feats=feats)
    flow = np.asarray(out["flow_up"])[0]                    # (H, W, 2)
    weights = 1.0 / (1.0 + np.exp(-np.asarray(out["weights_up"])[0, ..., 0]))

    hw = H_img * W_img
    xs = np.arange(hw) % W_img
    ys = np.arange(hw) // W_img
    src = np.stack([xs, ys], -1).astype(np.float64)
    dst = src + flow.reshape(hw, 2)
    dst_int = np.round(dst).astype(np.int64)
    oob = (np.any(dst < 0, axis=-1) | (dst_int[:, 0] >= W_img)
           | (dst_int[:, 1] >= H_img))
    valid_ours = (mask.reshape(hw) > 0) & ~oob
    print(f"ours: n_valid={valid_ours.sum()}")

    sv = src[valid_ours]
    dv = dst[valid_ours]
    wv = weights.reshape(hw)[valid_ours]
    H_ours = np.asarray(find_homography_wls_qr(
        jnp.asarray(dv[None]), jnp.asarray(sv[None]),
        jnp.asarray(wv[None]))[0], np.float64)

    # ---------------- reference (real tracker, extra_meta) ---------------
    from woft_tpu.models.checkpoint import export_torch_pth
    pth = export_torch_pth("/tmp/wraft_stepdbg.pth", fl.params)
    install_kornia_stub()
    install_cpu_shim()
    sys.path.insert(0, str(REFERENCE))
    from pytracking.utils.config import load_config as ref_load_config
    rconf = ref_load_config(str(REFERENCE / "pytracking" / "configs" /
                                "WOFT.py"))
    rconf.flow_config.model = str(pth)
    rconf.flow_config.non_strict_loading = True
    rconf.subsampler_fn = None
    tracker = rconf.tracker_class(rconf)
    tracker.device = "cpu"
    tracker.init(frames[0], mask)
    H_ref, meta = tracker.track(frames[1])

    # replicate the reference's masked TC set via ITS OWN components
    # (extra_meta is hard-coded off upstream, YAOF:86)
    import torch
    t_c, c_c, w_c = tracker.flower.compute_flow(
        frames[0], frames[1], mode="TC", do_sigmoid=True)
    pw = cv2.warpPerspective(np.ones(frames[1].shape[:2]), np.eye(3),
                             (W_img, H_img), flags=cv2.INTER_LINEAR)
    pw_t = torch.from_numpy(pw > 0)
    t_m, c_m, w_m, _, _ = tracker._mask_coords(t_c, c_c, w_c, None, pw_t)
    t_ref = t_m.cpu().numpy()            # (2, N) template coords (ints)
    c_ref = c_m.cpu().numpy()
    w_ref = w_m.cpu().numpy().ravel()
    print(f"ref:  n_valid={t_ref.shape[1]}")

    # ---- compare the sets ----
    key_ours = (sv[:, 1] * W_img + sv[:, 0]).astype(np.int64)
    key_ref = (t_ref[1].astype(np.int64) * W_img
               + t_ref[0].astype(np.int64))
    so, sr = set(key_ours.tolist()), set(key_ref.tolist())
    print(f"set diff: ours-only={len(so - sr)}  ref-only={len(sr - so)}")

    common = np.array(sorted(so & sr), np.int64)
    oi = {k: i for i, k in enumerate(key_ours.tolist())}
    ri = {k: i for i, k in enumerate(key_ref.tolist())}
    io = np.array([oi[k] for k in common])
    ir = np.array([ri[k] for k in common])
    dw = np.abs(wv[io] - w_ref[ir])
    dd = np.linalg.norm(dv[io] - np.stack([c_ref[0][ir], c_ref[1][ir]],
                                          -1), axis=1)
    print(f"common weights delta: median {np.median(dw):.3e} "
          f"max {dw.max():.3e}")
    print(f"common dst delta px:  median {np.median(dd):.3e} "
          f"max {dd.max():.3e}")

    # ---- fits ----
    H_ref = np.asarray(H_ref, np.float64)
    d_final = np.mean(np.linalg.norm(
        corners_of(H_ours, bbox) - corners_of(H_ref, bbox), axis=1))
    print(f"corner delta ours-vs-ref (their own fits): {d_final:.4f} px")

    # our solver on the REFERENCE's set: isolates solver vs set
    H_x = np.asarray(find_homography_wls_qr(
        jnp.asarray(np.stack([c_ref[0], c_ref[1]], -1)[None]),
        jnp.asarray(t_ref.T[None].astype(np.float64)),
        jnp.asarray(w_ref[None]))[0], np.float64)
    d_solver = np.mean(np.linalg.norm(
        corners_of(H_x, bbox) - corners_of(H_ref, bbox), axis=1))
    d_set = np.mean(np.linalg.norm(
        corners_of(H_x, bbox) - corners_of(H_ours, bbox), axis=1))
    print(f"  solver contribution (same set):      {d_solver:.4f} px")
    print(f"  set/weights contribution (same slv): {d_set:.4f} px")

    # ------- now the REAL trackers exactly as tools/headtohead.py runs
    # them (full-res frames, downscale_inputs=2, jitted step) -------------
    frames_full, _ = load_frames(str(REFERENCE / "demo" / "V25_2"), 2)
    mask_full = rect_mask(frames_full[0].shape,
                          (frames_full[0].shape[1] // 4,
                           frames_full[0].shape[0] // 4,
                           frames_full[0].shape[1] // 2,
                           frames_full[0].shape[0] // 2))

    conf2 = load_config(REPO / "woft_tpu" / "configs" / "WOFT.py")
    conf2.downscale_inputs = 2
    ours2 = conf2.tracker_class(conf2)
    ours2.init(frames_full[0], mask_full)
    _H2, meta2 = ours2.track(frames_full[1])
    H_ours_real = np.asarray(meta2.H_global_cur2init, np.float64)  # ds space

    d_real_vs_eager = np.mean(np.linalg.norm(
        corners_of(H_ours_real, bbox) - corners_of(H_ours, bbox), axis=1))
    print(f"OUR real (jit, ds=2) vs eager debug:   {d_real_vs_eager:.4f} px")

    d_real_vs_ref = np.mean(np.linalg.norm(
        corners_of(H_ours_real, bbox) - corners_of(H_ref, bbox), axis=1))
    print(f"OUR real (jit, ds=2) vs ref manual:    {d_real_vs_ref:.4f} px")

    rconf2 = ref_load_config(str(REFERENCE / "pytracking" / "configs" /
                                 "WOFT.py"))
    rconf2.flow_config.model = str(pth)
    rconf2.flow_config.non_strict_loading = True
    rconf2.subsampler_fn = None
    rconf2.downscale_inputs = 2
    rtr2 = rconf2.tracker_class(rconf2)
    rtr2.device = "cpu"
    rtr2.init(frames_full[0], mask_full)
    _Hr2, metar2 = rtr2.track(frames_full[1])
    H_ref_real = np.asarray(metar2.H_global_cur2init, np.float64)
    d_ref_real = np.mean(np.linalg.norm(
        corners_of(H_ref_real, bbox) - corners_of(H_ref, bbox), axis=1))
    print(f"REF real (ds=2) vs ref manual:         {d_ref_real:.4f} px")
    d_both_real = np.mean(np.linalg.norm(
        corners_of(H_ours_real, bbox) - corners_of(H_ref_real, bbox),
        axis=1))
    print(f"OUR real vs REF real (the h2h number): {d_both_real:.4f} px")
    return 0


if __name__ == "__main__":
    sys.exit(main())
