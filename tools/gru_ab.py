"""On-chip A/B for the fused SepConvGRU Pallas kernels (ops/pallas/gru.py).

Compiled-Mosaic vs XLA at the production 1080p GRU shape (135x240x128),
judged against a float32 oracle (the two bf16 paths legitimately differ
by accumulation order — see tests/test_gru_kernel.py), plus wall-clock
timing of a 12-iteration loop for both paths.

    python tools/gru_ab.py [--h 135] [--w 240] [--iters 12]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from woft_tpu.models import layers                     # noqa: E402
from woft_tpu.models.raft import (_sep_conv_gru,       # noqa: E402
                                  precompute_gru_context)
from woft_tpu.ops.pallas.gru import sep_conv_gru_pallas  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=135)
    ap.add_argument("--w", type=int, default=240)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()
    H, W = args.h, args.w
    print(f"backend={jax.default_backend()} shape=({H},{W},128)")

    ks = jax.random.split(jax.random.PRNGKey(0), 15)
    p = {}
    cin = 128 + 128 + 128
    for i, (name, kh, kw) in enumerate((("convz1", 1, 5), ("convr1", 1, 5),
                                        ("convq1", 1, 5), ("convz2", 5, 1),
                                        ("convr2", 5, 1),
                                        ("convq2", 5, 1))):
        p[name] = {"weight": 0.3 * jax.random.normal(
                       ks[2 * i], (kh, kw, cin, 128), jnp.float32),
                   "bias": 0.1 * jax.random.normal(ks[2 * i + 1], (128,),
                                                   jnp.float32)}
    h = jax.random.normal(ks[12], (1, H, W, 128), jnp.float32)
    x = jax.random.normal(ks[13], (1, H, W, 128), jnp.float32)
    inp = jax.random.normal(ks[14], (1, H, W, 128), jnp.float32)

    # --- correctness: both bf16 paths vs the f32 oracle ---
    layers.set_precision(jax.lax.Precision("highest"), None)
    pre32 = precompute_gru_context(p, inp, 128)
    ref32 = np.asarray(_sep_conv_gru(p, h, x, pre32))

    layers.set_precision(jax.lax.Precision("default"), jnp.bfloat16)
    pre = precompute_gru_context(p, inp, 128)
    xb = x.astype(jnp.bfloat16)
    xla_fn = jax.jit(lambda h, x: _sep_conv_gru(p, h, x, pre))
    ker_fn = jax.jit(lambda h, x: sep_conv_gru_pallas(p, h, x, pre))
    xla = np.asarray(xla_fn(h, xb))
    ker = np.asarray(ker_fn(h, xb))
    e_xla = np.abs(xla - ref32)
    e_ker = np.abs(ker - ref32)
    mut = np.abs(ker - xla)
    print(f"xla-bf16 vs f32: max {e_xla.max():.4f} mean {e_xla.mean():.6f}")
    print(f"kernel   vs f32: max {e_ker.max():.4f} mean {e_ker.mean():.6f}")
    print(f"kernel vs xla:   max {mut.max():.4f} mean {mut.mean():.6f}")
    ok = e_ker.mean() < 1.25 * e_xla.mean() + 1e-5
    print("CORRECTNESS:", "PASS" if ok else "FAIL")
    if not ok:
        # the recovery ladder gates WOFT_BENCH_GRU=1 on this exit code —
        # a FAIL must not silently enable the kernel in step 04
        return 1

    # --- timing: chained 12-iteration loops (device-resident; one fetch) ---
    def loop(fn):
        def run(h, x):
            def body(c, _):
                return fn(c, x), None
            out, _ = jax.lax.scan(body, h, None, length=args.iters)
            return out
        return jax.jit(run)

    for name, fn in (("xla", xla_fn), ("kernel", ker_fn)):
        lp = loop(fn)
        np.asarray(lp(h, xb))                   # compile + autotune
        np.asarray(lp(h, xb))
        reps = 10
        t0 = time.time()
        out = h
        for _ in range(reps):
            out = lp(out, xb)
        np.asarray(out)                          # force sync
        dt = (time.time() - t0) / (reps * args.iters) * 1e3
        print(f"{name:7s}: {dt:.3f} ms per gated-update pair "
              f"({args.iters}x loop, {reps} reps)")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
