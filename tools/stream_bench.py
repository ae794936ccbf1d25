#!/usr/bin/env python
"""BASELINE config 5: streaming 4K tracking end-to-end on the real chip.

Builds a 4K (3840x2160) jpg sequence from the reference demo clip (host
upscale, one-time), then drives ``pipeline.track_video`` — native threaded
JPEG decode feeding the device-resident window step — and reports fps with
the native loader vs the cv2 fallback, plus the decode-only rate.

Run on the TPU:  python tools/stream_bench.py [--frames 100]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

FRAME_DIR = Path("/tmp/woft_4k_frames")
SRC = Path("/root/reference/demo/V24_7")


def build_4k_frames(n):
    import cv2
    FRAME_DIR.mkdir(exist_ok=True)
    jpgs = sorted(SRC.glob("*.jpg"))[:n]
    existing = sorted(FRAME_DIR.glob("*.jpg"))
    if len(existing) >= len(jpgs):
        return len(existing)
    for i, p in enumerate(jpgs):
        img = cv2.imread(str(p))
        big = cv2.resize(img, (3840, 2160), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(FRAME_DIR / f"{i:05d}.jpg"), big,
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
    return len(jpgs)


def decode_only_rate(n):
    try:
        import woft_native
    except ImportError:
        return None
    jpgs = sorted(str(p) for p in FRAME_DIR.glob("*.jpg"))[:n]
    loader = woft_native.FrameLoader(jpgs, n_threads=4, prefetch=6)
    t0 = time.perf_counter()
    count = 0
    while True:
        f = loader.next_frame()
        if f is None:
            break
        count += 1
    return count / (time.perf_counter() - t0)


def run_stream(n, native=True):
    import woft_tpu.pipeline as pipeline
    from woft_tpu.models.raft import RaftConfig
    from woft_tpu.models.checkpoint import load_checkpoint
    from woft_tpu.models.raft import init_raft_params
    from woft_tpu.tracker.woft import TrackerParams
    from woft_tpu.tracker.window_step import window_params_for_mask

    cfg = RaftConfig(variant="weighted", iters=12, precision="bf16")
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    try:
        params = load_checkpoint("weights/wraft_tpu_v4", like=params)
    except Exception:
        print("[stream] trained ckpt unavailable; random weights")
    tp = TrackerParams(redetection="always", no_local_h=True)

    mask = np.zeros((2160, 3840), bool)
    mask[2160 // 3:2 * 2160 // 3, 3840 // 3:2 * 3840 // 3] = True
    wp = window_params_for_mask(mask, size=256)

    orig = pipeline._frame_source
    if native:
        # a silently-missing .so benchmarks the wrong subject (the r4
        # incident): fail loudly instead of falling back
        import woft_native  # noqa: F401  (ImportError = bench misconfigured)

        def checked(path, **kw):
            src = orig(path, **kw)
            first = next(src)
            assert pipeline.LAST_SOURCE == "native", \
                "native loader requested but cv2 fallback engaged"
            yield first
            yield from src

        pipeline._frame_source = checked
    else:
        # force the cv2 fallback path (honoring as_uint8 — a f32-only
        # fallback would mislabel the u8 A/B row)
        def no_native(path, **kw):
            from woft_tpu.utils.io import GeneralVideoCapture
            as_u8 = bool(kw.get("as_uint8", False))
            cap = GeneralVideoCapture(path)
            while True:
                ok, frame = cap.read()
                if not ok or frame is None:
                    return
                rgb = frame[:, :, ::-1]
                yield (np.ascontiguousarray(rgb) if as_u8
                       else rgb.astype(np.float32))

        pipeline._frame_source = no_native
    # WOFT_STREAM_U8=1: uint8 uploads + in-graph cast (4x fewer bytes
    # through the tunnel; NEW jaxpr -> fresh compile on first use)
    import os
    u8 = bool(int(os.environ.get("WOFT_STREAM_U8", "0")))
    probe = next(pipeline._frame_source(FRAME_DIR, as_uint8=u8))
    print(f"[stream] source={'native' if native else 'cv2'} "
          f"upload dtype={probe.dtype} shape={probe.shape}", flush=True)
    # warm compile on the first few frames, then time a fresh pass
    _ = pipeline.track_video(params, cfg, tp, wp, FRAME_DIR, mask,
                             max_frames=4, uint8_upload=u8)
    t0 = time.perf_counter()
    hs = pipeline.track_video(params, cfg, tp, wp, FRAME_DIR, mask,
                              max_frames=n, uint8_upload=u8)
    dt = time.perf_counter() - t0
    pipeline._frame_source = orig
    return (len(hs) - 1) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    args = ap.parse_args()

    # rebuild the native loader in-session (the r4 lesson: a stale/missing
    # .so silently benchmarked cv2); cheap no-op when already current
    import subprocess
    repo = Path(__file__).resolve().parent.parent
    subprocess.run([sys.executable, "setup.py", "build_ext", "--inplace"],
                   cwd=repo, check=True, capture_output=True)
    import woft_native  # noqa: F401 — hard requirement for this bench
    print(f"[stream] woft_native: {woft_native.__file__}", flush=True)

    n = build_4k_frames(args.frames)
    print(f"4K sequence: {n} frames at {FRAME_DIR}", flush=True)

    d = decode_only_rate(n)
    if d:
        print(f"native decode-only: {d:7.1f} frames/s", flush=True)

    fps_native = run_stream(n, native=True)
    print(f"stream 4K (native loader): {fps_native:7.2f} fps", flush=True)
    fps_cv2 = run_stream(n, native=False)
    print(f"stream 4K (cv2 fallback):  {fps_cv2:7.2f} fps", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
