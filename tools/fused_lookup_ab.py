#!/usr/bin/env python
"""On-chip A/B for the fused dense-pyramid lookup kernel (corr_impl='pallas').

The kernel's original dynamic lane roll was rejected by Mosaic when
compiled (interpret-only since r2); it now extracts the column window with
an exact one-hot lane-select matmul instead. This script asserts
compiled-Pallas == XLA one-hot lookup on the real chip for f32 and bf16
padded pyramids at two query scales, including out-of-bounds queries
(zero-pad semantics must match grid_sample's).

    python tools/fused_lookup_ab.py
    WOFT_AB_H1=45 WOFT_AB_W1=80 python tools/fused_lookup_ab.py

Exits nonzero on any FAIL so ladder scripts can gate enablement on rc.
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
    from woft_tpu.models.corr import corr_pyramid_fused, corr_lookup
    from woft_tpu.ops.pallas.corr_lookup import (fused_corr_lookup,
                                                 pad_pyramid)

    H1 = int(os.environ.get("WOFT_AB_H1", 90))
    W1 = int(os.environ.get("WOFT_AB_W1", 160))
    D = 256
    radius = 4
    levels = 4

    print(f"backend={jax.default_backend()} fmap=({H1},{W1},{D})", flush=True)
    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — this validates nothing new",
              flush=True)

    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((1, H1, W1, D)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, H1, W1, D)), jnp.float32)

    ys, xs = np.meshgrid(np.arange(H1, dtype=np.float32),
                         np.arange(W1, dtype=np.float32), indexing="ij")
    drift = np.stack([5.0 * np.sin(ys / 9.0) + 0.37,
                      4.0 * np.cos(xs / 7.0) - 0.21], axis=-1)
    coords = np.stack([xs, ys], axis=-1) + drift
    coords[0, :, 0] -= 300.0          # fully out of bounds: zero-pad window
    coords[1, :, 1] += 500.0
    coords = jnp.asarray(coords[None], jnp.float32)

    failures = 0
    # f32 volumes must match the XLA one-hot path bit-exactly; bf16 ones
    # differ by bf16 rounding (the kernel selects exact bf16 cells and
    # blends in f32; XLA's path accumulates at bf16-adjacent precision) —
    # same 2e-2-scale tolerance pallas_ab uses for bf16 volumes
    for dtype, tol in ((jnp.float32, 0.0), (jnp.bfloat16, 0.03)):
        # the XLA one-hot reference path reads the UNPADDED pyramid;
        # pad_pyramid adds the window pad + Mosaic tile alignment
        pyr, _ = corr_pyramid_fused(f1, f2, levels, pad=0, out_dtype=dtype)
        ref = np.asarray(corr_lookup(pyr, coords, radius, impl="onehot"))
        pp = pad_pyramid(pyr, radius)
        got = np.asarray(fused_corr_lookup(pp, coords, radius=radius, tq=8))
        delta = np.abs(got - ref).max()
        ok = delta <= tol
        failures += (not ok)
        print(f"fused_lookup {dtype.__name__}: max|delta|={delta:.3e} "
              f"{'PASS' if ok else 'FAIL'}", flush=True)

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
