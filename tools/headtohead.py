#!/usr/bin/env python
"""Head-to-head: WOFTTracker (JAX) vs the torch reference tracker, same
weights, same frames — the BASELINE.json accuracy metric measured as
stated ("<0.5 px median corner error vs the reference tracker").

The reference tracker hard-codes 'cuda'
(ref:pytracking/tracker/YAOF_tracker_single_control.py:24); its net already
runs on CPU in the parity tests, so a device shim (torch .to()/.cuda()
rewrites cuda->cpu) makes the WHOLE reference pipeline runnable here:
cv2 pre-warp, dynamic-shape TC masking, torch-Sobol subsampling, kornia
Hartley normalisation (stubbed with the exact formula), QR fit, the
inlier redetection ladder.

Weights: our native orbax checkpoint is exported to the reference's flat
.pth layout (models/checkpoint.export_torch_pth) and loaded by the
reference's own RAFTWrapper — identical parameters both sides.

Usage:
    python tools/headtohead.py --seq /root/reference/demo/V25_2 \
        --frames 25 --downscale 2 [--bbox x,y,w,h]

Prints per-frame corner disagreement (mean over the 4 target-bbox
corners, native input pixels) and the median over frames.
"""

import argparse
import json
import sys
import types
from pathlib import Path

# force CPU before any jax backend init: identical device for both sides,
# no tunnel compiles (CLAUDE.md: config update must precede backend init)
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))


def install_kornia_stub():
    """kornia is not installed; the reference solvers use exactly one
    function from it (ref:pytracking/utils/least_squares_H.py:168-169).
    Stub it with the kornia formula (Hartley: zero centroid, mean norm
    sqrt(2)); anything else raises AttributeError loudly."""
    import torch

    def normalize_points(points, eps=1e-8):
        assert points.ndim == 3 and points.shape[-1] == 2
        x_mean = torch.mean(points, dim=1, keepdim=True)        # (B,1,2)
        scale = (points - x_mean).norm(dim=-1, p=2).mean(dim=-1)  # (B,)
        scale = torch.sqrt(torch.tensor(2.0, dtype=points.dtype)) / (
            scale + eps)
        ones = torch.ones_like(scale)
        zeros = torch.zeros_like(scale)
        transform = torch.stack(
            [scale, zeros, -scale * x_mean[..., 0, 0],
             zeros, scale, -scale * x_mean[..., 0, 1],
             zeros, zeros, ones], dim=-1).view(-1, 3, 3)
        points_norm = (points - x_mean) * scale[:, None, None]
        return points_norm, transform

    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    epipolar = types.ModuleType("kornia.geometry.epipolar")
    conversions = types.ModuleType("kornia.geometry.conversions")
    homography = types.ModuleType("kornia.geometry.homography")
    def convert_points_to_homogeneous(points):
        # kornia twin: append a ones coordinate on the last axis
        return torch.cat(
            [points, torch.ones_like(points[..., :1])], dim=-1)

    def convert_points_from_homogeneous(points, eps=1e-8):
        # kornia twin: perspective divide with its |z|>eps guard
        z = points[..., -1:]
        mask = torch.abs(z) > eps
        scale = torch.where(mask, 1.0 / (z + eps), torch.ones_like(z))
        return scale * points[..., :-1]

    conversions.convert_points_to_homogeneous = convert_points_to_homogeneous
    conversions.convert_points_from_homogeneous = (
        convert_points_from_homogeneous)
    epipolar.normalize_points = normalize_points
    geometry.epipolar = epipolar
    geometry.conversions = conversions
    geometry.homography = homography
    kornia.geometry = geometry
    for name, mod in [("kornia", kornia), ("kornia.geometry", geometry),
                      ("kornia.geometry.epipolar", epipolar),
                      ("kornia.geometry.conversions", conversions),
                      ("kornia.geometry.homography", homography)]:
        sys.modules[name] = mod

    # ipdb (debugger) is not installed either; the reference only uses the
    # @iex post-mortem decorator (ref:pytracking/utils/various_utils.py:7-16)
    ipdb = types.ModuleType("ipdb")
    ipdb.iex = lambda fn: fn
    ipdb.set_trace = lambda *a, **k: None
    sys.modules["ipdb"] = ipdb


def install_cpu_shim():
    """Rewrite every torch cuda placement to cpu (the reference hard-codes
    'cuda'; see module docstring)."""
    import torch

    def _fix(arg):
        if isinstance(arg, str) and arg.startswith("cuda"):
            return "cpu"
        if isinstance(arg, torch.device) and arg.type == "cuda":
            return torch.device("cpu")
        return arg

    orig_tensor_to = torch.Tensor.to
    orig_module_to = torch.nn.Module.to

    def tensor_to(self, *args, **kwargs):
        args = tuple(_fix(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _fix(kwargs["device"])
        return orig_tensor_to(self, *args, **kwargs)

    def module_to(self, *args, **kwargs):
        args = tuple(_fix(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _fix(kwargs["device"])
        return orig_module_to(self, *args, **kwargs)

    torch.Tensor.to = tensor_to
    torch.nn.Module.to = module_to
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def load_frames(seq, n):
    import cv2
    paths = sorted(Path(seq).glob("*.jpg")) + sorted(Path(seq).glob("*.png"))
    assert paths, f"no frames in {seq}"
    return [cv2.imread(str(p)) for p in paths[:n]], [p.name for p in paths[:n]]


def rect_mask(shape, bbox):
    x, y, w, h = bbox
    mask = np.zeros(shape[:2], np.uint8)
    mask[y:y + h, x:x + w] = 255
    return mask


def run_ours(frames, mask, downscale, ckpt, no_subsample=False):
    import os
    if ckpt:
        os.environ["WOFT_WRAFT_CKPT"] = str(ckpt)
    from woft_tpu.config import load_config
    conf = load_config(REPO / "woft_tpu" / "configs" / "WOFT.py")
    if downscale > 1:
        conf.downscale_inputs = downscale
    if no_subsample:
        # fit on ALL valid TCs: removes the Sobol selection-set chaos so
        # the head-to-head measures the systematic difference only
        from woft_tpu.tracker.woft import TrackerParams
        n_pts = int((np.asarray(mask) > 0).sum())
        if downscale > 1:
            n_pts = n_pts // (downscale * downscale) + 4 * downscale
        # sparse_weights assumes ~500 solver points; at tens of thousands
        # its per-point window lookups blow memory — use the dense head
        conf.tracker_params = TrackerParams(subsample_n=n_pts,
                                            sparse_weights=False)
    tracker = conf.tracker_class(conf)
    tracker.init(frames[0], mask)
    hs = []
    for f in frames[1:]:
        H, meta = tracker.track(f)
        hs.append(np.asarray(H, np.float64))
    return hs, tracker.flower.params


def run_reference(frames, mask, downscale, pth_path, no_subsample=False):
    install_kornia_stub()
    install_cpu_shim()
    sys.path.insert(0, str(REFERENCE))
    from pytracking.utils.config import load_config as ref_load_config
    conf = ref_load_config(
        str(REFERENCE / "pytracking" / "configs" / "WOFT.py"))
    conf.flow_config.model = str(pth_path)
    # our export drops only BatchNorm num_batches_tracked counters (unused
    # at eval); verified below against the model's own state_dict keys
    conf.flow_config.non_strict_loading = True
    if downscale > 1:
        conf.downscale_inputs = downscale
    if no_subsample:
        conf.subsampler_fn = None      # falsy -> reference skips subsample
    tracker = conf.tracker_class(conf)
    tracker.device = "cpu"

    missing = (set(tracker.flower.net.state_dict().keys())
               - set(f"{k}" for k in __import__("torch").load(
                   str(pth_path), weights_only=True).keys()))
    unexpected_missing = {m for m in missing
                          if not m.endswith("num_batches_tracked")}
    assert not unexpected_missing, unexpected_missing

    tracker.init(frames[0], mask)
    hs = []
    for f in frames[1:]:
        H, meta = tracker.track(f)
        hs.append(np.asarray(H, np.float64))
    return hs


def corner_disagreement(h_ours, h_ref, bbox):
    """Mean distance between the 4 target corners placed in the current
    frame by each tracker: corners_cur = H_cur2init^-1 (bbox corners)."""
    x, y, w, h = bbox
    corners = np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]],
                       np.float64)
    pts = np.concatenate([corners, np.ones((4, 1))], axis=1).T   # (3,4)

    def project(H):
        p = np.linalg.inv(H) @ pts
        return (p[:2] / p[2:]).T                                  # (4,2)

    return float(np.mean(np.linalg.norm(project(h_ours) - project(h_ref),
                                        axis=1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default=str(REFERENCE / "demo" / "V25_2"))
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--downscale", type=int, default=2)
    ap.add_argument("--bbox", default=None,
                    help="x,y,w,h target rect in frame-0 pixels "
                         "(default: centered half-size box)")
    ap.add_argument("--ckpt", default=None,
                    help="native orbax checkpoint dir (default: the flow "
                         "config's preferred checkpoint)")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--h-out", default=None,
                    help="prefix: dump both H trajectories as "
                         "{prefix}_ours.npz / {prefix}_ref.npz "
                         "(demo homographies.npz layout)")
    ap.add_argument("--no-subsample", action="store_true",
                    help="fit on all valid TCs (both sides): measures the "
                         "systematic disagreement without Sobol "
                         "selection-set chaos")
    ap.add_argument("--self-test", action="store_true",
                    help="measure the REFERENCE tracker's own sensitivity "
                         "floor: reference vs reference on +-1-LSB "
                         "perturbed frames (chaos baseline for the "
                         "head-to-head numbers)")
    args = ap.parse_args()

    frames, names = load_frames(args.seq, args.frames)
    H_img, W_img = frames[0].shape[:2]
    if args.bbox:
        bbox = tuple(int(v) for v in args.bbox.split(","))
    else:
        bbox = (W_img // 4, H_img // 4, W_img // 2, H_img // 2)
    mask = rect_mask(frames[0].shape, bbox)

    print(f"[headtohead] {len(frames)} frames from {args.seq}, "
          f"bbox={bbox}, downscale={args.downscale}", flush=True)

    if args.self_test:
        # chaos floor: the reference against itself under a 1-LSB input
        # perturbation — any ours-vs-reference disagreement at or below
        # this level is indistinguishable from the reference's own
        # numerical sensitivity
        import os
        if args.ckpt:
            os.environ["WOFT_WRAFT_CKPT"] = str(args.ckpt)
        from woft_tpu.config import load_config
        conf = load_config(REPO / "woft_tpu" / "configs" / "WOFT.py")
        from woft_tpu.flow.wrapper import RaftFlow
        flower = RaftFlow(conf.flow_config)
        from woft_tpu.models.checkpoint import export_torch_pth
        pth = export_torch_pth("/tmp/wraft_headtohead.pth", flower.params)
        rng = np.random.default_rng(7)
        noisy = [np.clip(f.astype(np.int16)
                         + rng.integers(-1, 2, f.shape, dtype=np.int16),
                         0, 255).astype(np.uint8) for f in frames]
        hs_ours = run_reference(frames, mask, args.downscale, pth,
                                args.no_subsample)
        print("[headtohead] clean reference done; running perturbed",
              flush=True)
        hs_ref = run_reference(noisy, mask, args.downscale, pth,
                               args.no_subsample)
    else:
        hs_ours, params = run_ours(frames, mask, args.downscale, args.ckpt,
                                   args.no_subsample)
        from woft_tpu.models.checkpoint import export_torch_pth
        pth = export_torch_pth("/tmp/wraft_headtohead.pth", params)
        print("[headtohead] ours done; running the reference tracker "
              "(torch, CPU-shimmed)", flush=True)
        hs_ref = run_reference(frames, mask, args.downscale, pth,
                               args.no_subsample)

    dists = [corner_disagreement(a, b, bbox)
             for a, b in zip(hs_ours, hs_ref)]
    for name, d in zip(names[1:], dists):
        print(f"  {name}: {d:8.4f} px")
    result = {
        "seq": str(args.seq), "frames": len(frames), "bbox": bbox,
        "downscale": args.downscale,
        "median_corner_px": float(np.median(dists)),
        "mean_corner_px": float(np.mean(dists)),
        "max_corner_px": float(np.max(dists)),
    }
    print(json.dumps(result))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(result, indent=2))
    if args.h_out:
        # same layout as WOFT_demo --out homographies.npz (H[i] = the
        # (i+2)-th demo file): scoreable by tools/realdata_eval.py
        np.savez(args.h_out + "_ours.npz", H=np.stack(hs_ours))
        np.savez(args.h_out + "_ref.npz", H=np.stack(hs_ref))
    return 0


if __name__ == "__main__":
    sys.exit(main())
