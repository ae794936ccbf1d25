"""On-chip A/B for the fused update-tail kernels (ops/pallas/update_tail.py).

Compiled-Mosaic vs XLA at the production 1080p loop shape (135x240):
the motion-encoder 3x3 stack (convc2/convf2/conv) and the flow head
(conv1/conv2), judged against a float32 oracle (bf16 paths differ by
accumulation order — see tests/test_update_tail_kernel.py), plus
wall-clock timing of a 12-iteration loop for both paths.

    python tools/update_ab.py [--h 135] [--w 240] [--iters 12]
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

from woft_tpu.models import layers                        # noqa: E402
from woft_tpu.models.raft import (_basic_motion_encoder,  # noqa: E402
                                  _flow_head)
from woft_tpu.ops.pallas.update_tail import (             # noqa: E402
    flow_head_pallas, motion_encoder_pallas)


def _conv_p(k, kh, kw, ci, co, s=0.2):
    return {"weight": s * jax.random.normal(k, (kh, kw, ci, co),
                                            jnp.float32),
            "bias": 0.1 * jax.random.normal(jax.random.fold_in(k, 1),
                                            (co,), jnp.float32)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=135)
    ap.add_argument("--w", type=int, default=240)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()
    H, W = args.h, args.w
    print(f"backend={jax.default_backend()} shape=({H},{W})")

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    me = {"convc1": _conv_p(ks[0], 1, 1, 324, 256),
          "convc2": _conv_p(ks[1], 3, 3, 256, 192),
          "convf1": _conv_p(ks[2], 7, 7, 2, 128),
          "convf2": _conv_p(ks[3], 3, 3, 128, 64),
          "conv": _conv_p(ks[4], 3, 3, 256, 126)}
    fh = {"conv1": _conv_p(ks[5], 3, 3, 128, 256),
          "conv2": _conv_p(ks[6], 3, 3, 256, 2)}
    kc, kf, kn = jax.random.split(ks[7], 3)
    corr = jax.random.normal(kc, (1, H, W, 324), jnp.float32)
    flow = 3.0 * jax.random.normal(kf, (1, H, W, 2), jnp.float32)
    net = jax.random.normal(kn, (1, H, W, 128), jnp.float32)

    # --- correctness: both bf16 paths vs the f32 oracle ---
    layers.set_precision(jax.lax.Precision("highest"), None)
    ref_me = np.asarray(_basic_motion_encoder(me, flow, corr))
    ref_fh = np.asarray(_flow_head(fh, net))

    layers.set_precision(jax.lax.Precision("default"), jnp.bfloat16)
    xla_me_fn = jax.jit(lambda f, c: _basic_motion_encoder(me, f, c))
    ker_me_fn = jax.jit(
        lambda f, c: _basic_motion_encoder(me, f, c, pallas=True))
    xla_fh_fn = jax.jit(lambda n: _flow_head(fh, n.astype(jnp.bfloat16)))
    ker_fh_fn = jax.jit(lambda n: _flow_head(fh, n, pallas=True))

    failures = 0
    for name, ref, xla, ker in (
            ("motion-enc", ref_me,
             np.asarray(xla_me_fn(flow, corr)).astype(np.float32),
             np.asarray(ker_me_fn(flow, corr)).astype(np.float32)),
            ("flow-head", ref_fh,
             np.asarray(xla_fh_fn(net)).astype(np.float32),
             np.asarray(ker_fh_fn(net)).astype(np.float32))):
        e_xla = np.abs(xla - ref)
        e_ker = np.abs(ker - ref)
        mut = np.abs(ker - xla)
        ok = e_ker.mean() < 1.25 * e_xla.mean() + 1e-5
        failures += not ok
        print(f"{name}: xla-vs-f32 mean {e_xla.mean():.6f}  "
              f"kernel-vs-f32 mean {e_ker.mean():.6f}  "
              f"mutual max {mut.max():.4f} -> "
              f"{'PASS' if ok else 'FAIL'}", flush=True)

    # --- timing: 12-iteration device-resident loops ---
    def loop_me(fn):
        def run(f, c):
            def body(carry, _):
                m = fn(carry, c)
                # feed two motion channels back as flow: keeps the chain
                # data-dependent so the loop cannot collapse
                return m[..., :2].astype(jnp.float32), None
            out, _ = jax.lax.scan(body, f, None, length=args.iters)
            return out
        return jax.jit(run)

    def loop_fh(fn):
        def run(n):
            def body(carry, _):
                d = fn(carry)
                return carry + 0.01 * jnp.pad(
                    d, ((0, 0),) * 3 + ((0, 126),)), None
            out, _ = jax.lax.scan(body, n, None, length=args.iters)
            return out
        return jax.jit(run)

    for name, lp, args_ in (
            ("me xla", loop_me(xla_me_fn), (flow, corr)),
            ("me kernel", loop_me(ker_me_fn), (flow, corr)),
            ("fh xla", loop_fh(xla_fh_fn), (net,)),
            ("fh kernel", loop_fh(ker_fh_fn), (net,))):
        np.asarray(lp(*args_))                  # compile + autotune
        np.asarray(lp(*args_))
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            out = lp(*args_)
        np.asarray(out)
        dt = (time.time() - t0) / (reps * args.iters) * 1e3
        print(f"{name:10s}: {dt:.3f} ms per call "
              f"({args.iters}x loop, {reps} reps)", flush=True)

    layers.set_precision(jax.lax.Precision("highest"), None)
    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
