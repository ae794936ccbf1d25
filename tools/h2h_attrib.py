#!/usr/bin/env python
"""Attribute the head-to-head disagreement to its source for ONE frame
pair (identity pre-warp): dense-flow difference vs solver difference.

Both nets get identical exported weights and identical inputs; the same
Sobol-selected TCs are fitted through our WLS-QR solver, so corner deltas
split cleanly:

    ours-flow vs ref-flow, same solver  -> flow-caused corner error
    same flow, jax-QR vs torch-QR       -> solver-caused corner error

Usage: python tools/h2h_attrib.py [--downscale 2]
"""

import argparse
import sys
from pathlib import Path

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))

from headtohead import (install_cpu_shim, install_kornia_stub,  # noqa: E402
                        load_frames, rect_mask)

sys.path.insert(0, str(REPO / "tools"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--downscale", type=int, default=2)
    ap.add_argument("--seq", default=str(REFERENCE / "demo" / "V25_2"))
    args = ap.parse_args()

    import cv2
    frames, _ = load_frames(args.seq, 2)
    if args.downscale > 1:
        frames = [cv2.resize(f, None, fx=1 / args.downscale,
                             fy=1 / args.downscale) for f in frames]
    H_img, W_img = frames[0].shape[:2]
    bbox = (W_img // 4, H_img // 4, W_img // 2, H_img // 2)
    mask = rect_mask(frames[0].shape, bbox) > 0

    # ---- our flow ----
    from woft_tpu.config import load_config
    conf = load_config(REPO / "woft_tpu" / "configs" / "WOFT.py")
    from woft_tpu.flow.wrapper import RaftFlow
    flower = RaftFlow(conf.flow_config)
    fo, wo = flower.compute_flow(frames[0], frames[1], mode="flow",
                                 numpy_out=True, do_sigmoid=True)[:2]
    flow_ours = np.transpose(np.asarray(fo), (1, 2, 0))
    w_ours = np.asarray(wo).reshape(H_img, W_img)

    from woft_tpu.models.checkpoint import export_torch_pth
    pth = export_torch_pth("/tmp/wraft_attrib.pth", flower.params)

    # ---- reference flow (same weights) ----
    install_kornia_stub()
    install_cpu_shim()
    sys.path.insert(0, str(REFERENCE))
    from pytracking.utils.config import load_config as ref_load_config
    rconf = ref_load_config(
        str(REFERENCE / "pytracking" / "optical_flow" / "configs" /
            "v2_SNOB_large_g05_RAFT.py"))
    rconf.model = str(pth)
    rconf.non_strict_loading = True
    from pytracking.optical_flow.raft import RAFTWrapper
    rflower = RAFTWrapper(rconf)
    rf, rw = rflower.compute_flow(frames[0], frames[1], mode="flow",
                                  numpy_out=True, do_sigmoid=True)[:2]
    flow_ref = np.transpose(np.asarray(rf), (1, 2, 0))
    w_ref = np.asarray(rw).reshape(H_img, W_img)

    d = np.linalg.norm(flow_ours - flow_ref, axis=-1)[mask]
    wd = np.abs(w_ours - w_ref)[mask]
    print(f"flow delta px (masked): median {np.median(d):.4e}  "
          f"p90 {np.percentile(d, 90):.4e}  max {d.max():.4e}")
    print(f"weight delta:           median {np.median(wd):.4e}  "
          f"max {wd.max():.4e}")

    # ---- same TC selection, both flows, our f64 solver ----
    ys, xs = np.nonzero(mask)
    src = np.stack([xs, ys], -1).astype(np.float64)
    rng_idx = np.arange(len(src))
    # torch-Sobol twin draw of 500 (duplicates collapse, as both trackers)
    import torch
    eng = torch.quasirandom.SobolEngine(dimension=1)
    sel = np.unique(np.round(
        len(src) * eng.draw(500).numpy().flatten()).astype(int) % len(src))
    s = src[sel]

    def fit(flow, weights):
        dst = s + flow[s[:, 1].astype(int), s[:, 0].astype(int)]
        w = weights[s[:, 1].astype(int), s[:, 0].astype(int)]
        # f64 normal-equation twin of the WLS fit (oracle precision)
        from woft_tpu.geometry.homography import find_homography_wls_qr
        import jax.numpy as jnp
        Hj = find_homography_wls_qr(jnp.asarray(dst[None]),
                                    jnp.asarray(s[None]),
                                    jnp.asarray(w[None]))
        return np.asarray(Hj[0], np.float64)

    H_of = fit(flow_ours, w_ours)
    H_rf = fit(flow_ref, w_ref)

    x, y, w_, h_ = bbox
    corners = np.array([[x, y], [x + w_, y], [x + w_, y + h_], [x, y + h_]],
                       np.float64)
    pts = np.concatenate([corners, np.ones((4, 1))], axis=1).T

    def project(Hm):
        p = np.linalg.inv(Hm) @ pts
        return (p[:2] / p[2:]).T

    flow_err = np.mean(np.linalg.norm(project(H_of) - project(H_rf), axis=1))
    print(f"corner delta from FLOW difference (same solver): "
          f"{flow_err:.4f} px")

    # ---- same flow (ours), our solver vs reference torch-QR solver ----
    from pytracking.utils.least_squares_H import (
        find_homography_nonhomogeneous_QR)
    dst = s + flow_ours[s[:, 1].astype(int), s[:, 0].astype(int)]
    w = w_ours[s[:, 1].astype(int), s[:, 0].astype(int)]
    Ht = find_homography_nonhomogeneous_QR(
        torch.from_numpy(dst[None]).float(),
        torch.from_numpy(s[None]).float(),
        weights=torch.from_numpy(w[None]).float())
    Ht = np.asarray(Ht[0].numpy(), np.float64)
    solver_err = np.mean(np.linalg.norm(project(H_of) - project(Ht), axis=1))
    print(f"corner delta from SOLVER difference (same flow): "
          f"{solver_err:.4f} px")
    return 0


if __name__ == "__main__":
    sys.exit(main())
