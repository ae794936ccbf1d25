#!/usr/bin/env python
"""On-chip A/B validation of the compiled Pallas block-local correlation
kernel (VERDICT r2 weak #4): the production TPU path
(``build_local_corr(use_pallas=True)``, ops/pallas/local_corr.py) was
parity-tested only via interpret mode on CPU; Mosaic lowering differs, so
this script asserts compiled-Pallas == XLA *on the real chip* for f32 and
bf16 volumes at margins 8 and 16, both for the stored volumes and for a
representative pyramid lookup through them.

Run on the TPU (no JAX_PLATFORMS override):
    python tools/pallas_ab.py            # full-frame 1080p/8 fmap shapes
    WOFT_AB_H1=45 WOFT_AB_W1=80 python tools/pallas_ab.py   # 360p shapes

Prints one PASS/FAIL line per configuration plus max|delta|.
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def main():
    from woft_tpu.models.corr import build_local_corr, corr_lookup_local

    H1 = int(os.environ.get("WOFT_AB_H1", 135))
    W1 = int(os.environ.get("WOFT_AB_W1", 240))
    D = 256
    radius = 4

    print(f"backend={jax.default_backend()} fmap=({H1},{W1},{D})",
          flush=True)
    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — this validates nothing new",
              flush=True)

    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((1, H1, W1, D)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, H1, W1, D)), jnp.float32)

    # representative centroids: query position + smooth drift within the
    # exactness envelope, plus a row of beyond-margin outliers (saturation
    # must also agree between paths)
    ys, xs = np.meshgrid(np.arange(H1, dtype=np.float32),
                         np.arange(W1, dtype=np.float32), indexing="ij")
    drift = np.stack([3.0 * np.sin(ys / 9.0) + 0.3,
                      2.0 * np.cos(xs / 7.0) - 0.2], axis=-1)
    coords = np.stack([xs, ys], axis=-1) + drift
    coords[0, :, 0] += 200.0          # far beyond any margin: saturates
    coords = jnp.asarray(coords[None], jnp.float32)

    failures = 0
    for margin in (8, 16):
        for dtype, tol in ((None, 2e-5), (jnp.bfloat16, 2e-2)):
            kw = dict(radius=radius, num_levels=4, margin=margin,
                      out_dtype=dtype)
            vol_p = build_local_corr(f1, f2, use_pallas=True, **kw)
            vol_x = build_local_corr(f1, f2, use_pallas=False, **kw)
            vmax = max(
                float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
                for a, b in zip(vol_p.volumes, vol_x.volumes))
            lk_p = corr_lookup_local(vol_p, coords, radius)
            lk_x = corr_lookup_local(vol_x, coords, radius)
            lmax = float(jnp.max(jnp.abs(lk_p - lk_x)))
            # scale tolerance by the correlation magnitude (dot of D=256
            # unit-variance features / sqrt(D) ~ N(0, sqrt(D)))
            ok = vmax <= tol * 16 and lmax <= tol * 16
            failures += not ok
            name = "f32" if dtype is None else "bf16"
            print(f"margin={margin:2d} {name}: volumes max|d|={vmax:.3e} "
                  f"lookup max|d|={lmax:.3e} -> "
                  f"{'PASS' if ok else 'FAIL'}", flush=True)

    # r3: the p-layout construction + Pallas slab-lookup kernel pair (the
    # blocked hot path) vs the q-layout one-hot reference, compiled on chip
    for margin in (8, 16):
        for dtype, tol in ((None, 2e-5), (jnp.bfloat16, 2e-2)):
            kw = dict(radius=radius, num_levels=4, margin=margin,
                      out_dtype=dtype)
            vol_p = build_local_corr(f1, f2, use_pallas=True, layout="p",
                                     **kw)
            vol_q = build_local_corr(f1, f2, use_pallas=False, layout="q",
                                     **kw)
            lk_p = corr_lookup_local(vol_p, coords, radius)   # slab kernel
            lk_q = corr_lookup_local(vol_q, coords, radius)   # one-hot XLA
            lmax = float(jnp.max(jnp.abs(lk_p - lk_q)))
            ok = lmax <= tol * 16
            failures += not ok
            name = "f32" if dtype is None else "bf16"
            print(f"margin={margin:2d} {name} slab-kernel p-layout: "
                  f"lookup max|d|={lmax:.3e} -> "
                  f"{'PASS' if ok else 'FAIL'}", flush=True)

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
