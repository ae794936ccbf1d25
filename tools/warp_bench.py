#!/usr/bin/env python
"""On-chip validation + benchmark of the Pallas block-warp kernel vs the
XLA gather warp at 1080p (the tracker pre-warp, 57 ms/frame in r2 xprof).

Run on the TPU:  python tools/warp_bench.py
Prints compiled-vs-gather max|delta| (must be ~0) and per-warp times.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = np.asarray(out[0, 0, :2, 0] if out.ndim == 4 else out)   # sync
    t0 = time.perf_counter()
    prev = out
    for _i in range(iters):
        prev = fn(*args)
    _ = np.asarray(prev[0, 0, :2, 0] if prev.ndim == 4 else prev)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from woft_tpu.ops.warp import (grid_sample, perspective_coords,
                                   warp_perspective_fast)

    failures = []

    H_img, W_img = 1080, 1920
    print(f"backend={jax.default_backend()} {H_img}x{W_img}", flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (1, H_img, W_img, 3)),
                      jnp.float32)
    th, tx, ty, sc = 0.05, 23.0, -11.0, 1.08
    c, s = np.cos(th), np.sin(th)
    Hm = jnp.asarray(np.array([[sc * c, -sc * s, tx],
                               [sc * s, sc * c, ty],
                               [2e-6, -1e-6, 1.0]], np.float32))

    gather = jax.jit(lambda im, h: grid_sample(
        im, perspective_coords(h[None], im.shape[1:3])))
    pallas = jax.jit(lambda im, h: warp_perspective_fast(
        im, h, use_pallas=True))

    a = np.asarray(gather(img, Hm))
    b = np.asarray(pallas(img, Hm))
    d = float(np.max(np.abs(a - b)))
    failures.append(not d < 1e-3)
    print(f"compiled pallas vs gather max|delta| = {d:.3e} "
          f"({'PASS' if d < 1e-3 else 'FAIL'})", flush=True)

    t_g = timeit(gather, img, Hm)
    t_p = timeit(pallas, img, Hm)
    print(f"gather warp:  {t_g:8.2f} ms/frame")
    print(f"pallas warp:  {t_p:8.2f} ms/frame   ({t_g / t_p:.2f}x)")

    # r3 tiered dispatch: a ~1.4x zoom-out exceeds the small (32, 256)
    # patch tier but fits the big (48, 384) one — exactness + the cost of
    # escalating one cond level
    s = 1 / 1.4
    Hmid = jnp.asarray(np.array([[s, 0.0, 9.0], [0.0, s, 4.0],
                                 [0.0, 0.0, 1.0]], np.float32))
    a = np.asarray(gather(img, Hmid))
    b = np.asarray(pallas(img, Hmid))
    d = float(np.max(np.abs(a - b)))
    failures.append(not d < 1e-3)
    print(f"mid-tier (1.4x zoom-out) max|delta| = {d:.3e} "
          f"({'PASS' if d < 1e-3 else 'FAIL'})", flush=True)
    t_m = timeit(pallas, img, Hmid)
    print(f"mid-tier path: {t_m:8.2f} ms/frame")

    # r3 bf16 source staging ('default' blend mode) on a uint8-valued
    # frame: must stay within one intensity step of the exact gather
    img8 = jnp.asarray(rng.integers(0, 256, (1, H_img, W_img, 3)),
                       jnp.float32)
    pallas_bf16 = jax.jit(lambda im, h: warp_perspective_fast(
        im, h, use_pallas=True, precision="default"))
    a = np.asarray(gather(img8, Hm))
    b = np.asarray(pallas_bf16(img8, Hm))
    d = float(np.max(np.abs(a - b)))
    failures.append(not d <= 1.0)
    print(f"bf16-staged blend (uint8 frame) max|delta| = {d:.3e} "
          f"({'PASS' if d <= 1.0 else 'FAIL'})", flush=True)
    t_b = timeit(pallas_bf16, img8, Hm)
    print(f"bf16-staged small tier: {t_b:8.2f} ms/frame")

    # out-of-envelope dispatch (90 deg rotation): must still be exact
    Hrot = jnp.asarray(np.array([[0.0, -1.0, W_img * 0.8],
                                 [1.0, 0.0, -W_img * 0.2],
                                 [0.0, 0.0, 1.0]], np.float32))
    a = np.asarray(gather(img, Hrot))
    b = np.asarray(pallas(img, Hrot))
    d = float(np.max(np.abs(a - b)))
    failures.append(not d < 1e-3)
    print(f"out-of-envelope fallback max|delta| = {d:.3e} "
          f"({'PASS' if d < 1e-3 else 'FAIL'})")
    t_f = timeit(pallas, img, Hrot)
    print(f"fallback path: {t_f:8.2f} ms/frame")
    return 1 if any(failures) else 0


if __name__ == "__main__":
    sys.exit(main())
