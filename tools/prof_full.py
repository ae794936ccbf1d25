#!/usr/bin/env python
"""Microbenchmark the full-frame pipeline components at 1080p on the real chip.

Each component is wrapped in a lax.scan loop inside one jit so tunnel
dispatch/fetch latency amortizes; a data dependency through the carry
prevents XLA from hoisting the body out of the loop. Results print as they
complete (cheap compiles first).

Usage: python tools/prof_full.py [component ...]
Components: warp encoder volume volume_fused lookups pallas_old update
            weight_head upsample
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

H, W = 1080, 1920
H1, W1 = H // 8, W // 8          # 135, 240
Q = H1 * W1                      # 32400
D = 256
LOOP = 8
LV_SHAPES = [(H1, W1)]
for _ in range(3):
    h, w = LV_SHAPES[-1]
    LV_SHAPES.append((h // 2, w // 2))


def timed_loop(name, body, carry, n=LOOP):
    """body: carry -> carry (data-dependent). Prints per-iter ms."""
    @jax.jit
    def loop(c):
        out = lax.scan(lambda c, _: (body(c), None), c, None, length=n)[0]
        # reduce to ONE scalar on device: fetching a full carry through
        # the tunnel costs ~100+ ms and used to dominate the measurement
        return jax.tree.leaves(out)[0].ravel()[0]

    t0 = time.perf_counter()
    np.asarray(loop(carry))
    compile_s = time.perf_counter() - t0

    # post-compile autotune through the tunnel makes the next 1-2
    # executions up to ~100x slower (CLAUDE.md) — warm 3 before timing
    for _ in range(3):
        np.asarray(loop(carry))

    t0 = time.perf_counter()
    np.asarray(loop(carry))
    total = time.perf_counter() - t0
    print(f"{name:36s} {1000 * total / n:9.2f} ms/iter"
          f"   (compile+1st {compile_s:.1f}s)", flush=True)
    return 1000 * total / n


def dep(x, scalar):
    """Inject a data dependency without changing the value measurably."""
    return x + 1e-30 * scalar.astype(x.dtype)


def rngs():
    return np.random.default_rng(0)


def bench_warp():
    from woft_tpu.ops.warp import warp_perspective
    rng = rngs()
    img = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)
    Hm = jnp.asarray(np.array([[1.01, 0.01, 5.0], [0.0, 0.99, -3.0],
                               [1e-5, 0, 1.0]]), jnp.float32)

    def body(c):
        img, Hm = c
        out = warp_perspective(img, Hm)
        return (dep(img, out.mean()), Hm)

    timed_loop("warp_perspective 1080p x3ch", body, (img, Hm))


def bench_encoder():
    from woft_tpu.models.raft import RaftConfig, init_raft_params, \
        encoder_apply
    from woft_tpu.models import layers
    cfg = RaftConfig(variant="weighted", precision="bf16")
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    rng = rngs()
    img = jnp.asarray(rng.uniform(-1, 1, (1, H, W, 3)), jnp.float32)

    def body(img):
        layers.set_precision(cfg.lax_precision, cfg.compute_dtype)
        f = encoder_apply(params["fnet"], img, "instance", False)
        return dep(img, f.mean())

    timed_loop("fnet encoder 1080p (bf16)", body, img)


def _fmaps():
    rng = rngs()
    f1 = jnp.asarray(rng.standard_normal((1, H1, W1, D)) * 0.5, jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, H1, W1, D)) * 0.5, jnp.float32)
    return f1, f2


def bench_volume():
    from woft_tpu.models.corr import all_pairs_correlation, corr_pyramid
    f1, f2 = _fmaps()

    def body_f32(c):
        f1, f2 = c
        corr = all_pairs_correlation(f1, f2,
                                     precision=jax.lax.Precision.DEFAULT)
        pyr = corr_pyramid(corr)
        s = sum(p.mean() for p in pyr)
        return (dep(f1, s), f2)

    timed_loop("all_pairs+pyramid f32", body_f32, (f1, f2), n=4)

    def body_bf16(c):
        f1, f2 = c
        corr = all_pairs_correlation(f1.astype(jnp.bfloat16),
                                     f2.astype(jnp.bfloat16),
                                     precision=jax.lax.Precision.DEFAULT)
        pyr = [p.astype(jnp.bfloat16) for p in corr_pyramid(corr)]
        s = sum(p.astype(jnp.float32).mean() for p in pyr)
        return (dep(f1, s), f2)

    timed_loop("all_pairs+pyramid+cast bf16", body_bf16, (f1, f2), n=4)

    from woft_tpu.ops.pallas.corr_lookup import pad_pyramid
    from woft_tpu.models.corr import all_pairs_correlation as apc

    def body_pad(c):
        f1, f2 = c
        corr = apc(f1.astype(jnp.bfloat16), f2.astype(jnp.bfloat16),
                   precision=jax.lax.Precision.DEFAULT)
        pyr = corr_pyramid(corr)
        padded = pad_pyramid(pyr, 4, dtype=jnp.bfloat16)
        s = sum(p.astype(jnp.float32).mean() for p in padded)
        return (dep(f1, s), f2)

    timed_loop("all_pairs+pyr+pad bf16 (r1 path)", body_pad, (f1, f2), n=4)


def bench_volume_fused():
    """Proposed: per-level einsum vs pooled+padded fmap2 (no pool/pad pass)."""
    from woft_tpu.ops.warp import avg_pool2d
    f1, f2 = _fmaps()
    pad = 10

    def body(c):
        f1, f2 = c
        q = f1.reshape(Q, D).astype(jnp.bfloat16)
        lv = f2
        s = jnp.float32(0)
        for l in range(4):
            fp = jnp.pad(lv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            hp, wp = fp.shape[1:3]
            corr_l = jnp.einsum(
                "qd,pd->qp", q, fp.reshape(hp * wp, D).astype(jnp.bfloat16),
                preferred_element_type=jnp.bfloat16)
            s += corr_l.astype(jnp.float32).mean()
            if l < 3:
                lv = avg_pool2d(lv)
        mean_resp = q.astype(jnp.float32) @ jnp.mean(
            f2.reshape(-1, D), axis=0)
        s += mean_resp.mean()
        return (dep(f1, s), f2)

    timed_loop("fused pooled-f2 padded einsums bf16", body, (f1, f2), n=4)


def _pyramid(dtype=jnp.bfloat16):
    rng = rngs()
    return [jnp.asarray(rng.standard_normal((Q, h, w)), dtype)
            for (h, w) in LV_SHAPES]


def _coords():
    rng = rngs()
    xs = rng.uniform(0, W1 - 1, (1, H1, W1, 1))
    ys = rng.uniform(0, H1 - 1, (1, H1, W1, 1))
    return jnp.asarray(np.concatenate([xs, ys], -1), jnp.float32)


def bench_lookups():
    from woft_tpu.models.corr import corr_lookup, corr_lookup_dslice
    from woft_tpu.ops.pallas.corr_lookup import pad_pyramid
    coords = _coords()

    for impl, dtype in (("onehot", jnp.bfloat16), ("rowgather", jnp.bfloat16),
                        ("gather", jnp.bfloat16)):
        pyr = _pyramid(dtype)

        def body(c, pyr=pyr, impl=impl):
            out = corr_lookup(pyr, c, 4, impl=impl)
            return dep(c, out.mean())

        try:
            timed_loop(f"lookup {impl} ({dtype.__name__})", body, coords, n=4)
        except Exception as e:  # noqa: BLE001
            print(f"lookup {impl}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    padded = pad_pyramid(_pyramid(jnp.float32), 4, dtype=jnp.bfloat16)

    def body_ds(c):
        out = corr_lookup_dslice(padded, c, 4)
        return dep(c, out.mean())

    try:
        timed_loop("lookup dslice (bf16 padded)", body_ds, coords, n=4)
    except Exception as e:  # noqa: BLE001
        print(f"lookup dslice: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def bench_pallas_old():
    from woft_tpu.ops.pallas.corr_lookup import pad_pyramid, fused_corr_lookup
    coords = _coords()
    padded = pad_pyramid(_pyramid(jnp.float32), 4)

    def body(c):
        out = fused_corr_lookup(padded, c, radius=4)
        return dep(c, out.mean())

    try:
        timed_loop("lookup pallas r1 (compiled)", body, coords, n=4)
    except Exception as e:  # noqa: BLE001
        print("lookup pallas r1: FAILED:", flush=True)
        print(str(e)[:3000], flush=True)


def bench_update():
    from woft_tpu.models.raft import RaftConfig, init_raft_params, \
        update_block_apply
    from woft_tpu.models import layers
    cfg = RaftConfig(variant="weighted", precision="bf16")
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    rng = rngs()
    net = jnp.asarray(rng.standard_normal((1, H1, W1, 128)), jnp.float32)
    inp = jnp.asarray(rng.standard_normal((1, H1, W1, 128)), jnp.float32)
    corr = jnp.asarray(rng.standard_normal((1, H1, W1, 324)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, H1, W1, 2)), jnp.float32)

    def body(c):
        net, flow = c
        layers.set_precision(cfg.lax_precision, cfg.compute_dtype)
        net2, mask, delta = update_block_apply(params["update_block"],
                                               net, inp, corr, flow)
        return (net2, flow + delta)

    timed_loop("update block (1 GRU iter, bf16)", body, (net, flow))


def bench_weight_head():
    from woft_tpu.models.raft import RaftConfig, init_raft_params, \
        weight_head_apply
    from woft_tpu.models import layers
    cfg = RaftConfig(variant="weighted", precision="bf16")
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    rng = rngs()
    cs = jnp.asarray(rng.standard_normal((1, H1, W1, 9, 9, 4)), jnp.float32)
    mr = jnp.asarray(rng.standard_normal((1, H1, W1)), jnp.float32)

    def body(c):
        layers.set_precision(cfg.lax_precision, cfg.compute_dtype)
        w = weight_head_apply(params["weight_head"], c, mr,
                              cfg.weight_head_structure)
        return dep(c, w.mean())

    timed_loop("weight head (full frame, bf16)", body, cs, n=4)


def bench_upsample():
    from woft_tpu.models.raft import convex_upsample
    rng = rngs()
    flow = jnp.asarray(rng.standard_normal((1, H1, W1, 2)), jnp.float32)
    mask = jnp.asarray(rng.standard_normal((1, H1, W1, 576)), jnp.float32)

    def body(c):
        flow, mask = c
        up = convex_upsample(flow, mask)
        return (dep(flow, up.mean()), mask)

    timed_loop("convex upsample flow 1080p", body, (flow, mask))


def bench_pallas_warp():
    from woft_tpu.ops.warp import warp_perspective_fast
    rng = rngs()
    img = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)), jnp.float32)
    Hm = jnp.asarray(np.array([[1.01, 0.01, 5.0], [0.0, 0.99, -3.0],
                               [1e-5, 0, 1.0]]), jnp.float32)

    def body(c):
        img, Hm = c
        out = warp_perspective_fast(img, Hm, use_pallas=True)
        return (dep(img, out.mean()), Hm)

    timed_loop("pallas block warp 1080p x3ch", body, (img, Hm))


def bench_local_lookup():
    from woft_tpu.models.corr import (LocalCorrVolumes, build_local_corr,
                                      corr_lookup_local)
    f1, f2 = _fmaps()
    vol = build_local_corr(f1, f2, out_dtype=jnp.bfloat16)
    meta = vol.meta
    coords = _coords() * 8.0          # level-0 full-res-ish centroids

    # thread the volumes through the carry — closed-over device arrays
    # become HLO constants and blow the tunnel's compile-request limit
    def body(c):
        coords, vols = c
        out = corr_lookup_local(LocalCorrVolumes(list(vols), meta),
                                coords, 4)
        return (dep(coords, out.mean()), vols)

    timed_loop("lookup local (block volumes)", body,
               (coords, tuple(vol.volumes)), n=4)

    from woft_tpu.models.corr import corr_lookup_local_blocked
    volp = build_local_corr(f1, f2, out_dtype=jnp.bfloat16, layout="p",
                            use_pallas=True)
    metap = volp.meta

    def body_pk(c):
        coords, vols = c
        out = corr_lookup_local_blocked(
            LocalCorrVolumes(list(vols), metap), coords, 4)
        return (dep(coords, out.data.mean()), vols)

    timed_loop("lookup p-layout (slab kernel only)", body_pk,
               (coords, tuple(volp.volumes)), n=4)

    def body_pn(c):
        coords, vols = c
        out = corr_lookup_local(LocalCorrVolumes(list(vols), metap),
                                coords, 4)
        return (dep(coords, out.mean()), vols)

    timed_loop("lookup p-layout (natural = +transpose)", body_pn,
               (coords, tuple(volp.volumes)), n=4)

    def body_build(c):
        f1, f2 = c
        v = build_local_corr(f1, f2, out_dtype=jnp.bfloat16)
        s = sum(p.astype(jnp.float32).mean() for p in v.volumes)
        return (dep(f1, s), f2)

    timed_loop("build_local_corr (pallas)", body_build, (f1, f2), n=4)


def bench_update_parts():
    from woft_tpu.models.raft import (RaftConfig, init_raft_params,
                                      _basic_motion_encoder, _sep_conv_gru,
                                      _flow_head)
    from woft_tpu.models import layers
    cfg = RaftConfig(variant="weighted", precision="bf16")
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    up = params["update_block"]
    rng = rngs()
    net = jnp.asarray(rng.standard_normal((1, H1, W1, 128)), jnp.float32)
    inp = jnp.asarray(rng.standard_normal((1, H1, W1, 128)), jnp.float32)
    corr = jnp.asarray(rng.standard_normal((1, H1, W1, 324)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, H1, W1, 2)), jnp.float32)
    motion = jnp.asarray(rng.standard_normal((1, H1, W1, 128)), jnp.float32)

    layers.set_precision(cfg.lax_precision, cfg.compute_dtype)

    def body_me(c):
        m = _basic_motion_encoder(up["encoder"], c[1], corr)
        return (dep(c[0], m.mean()), c[1])

    timed_loop("  motion encoder only", body_me, (net, flow))

    def body_gru(c):
        n = _sep_conv_gru(up["gru"], c[0], jnp.concatenate([inp, c[1]], -1))
        return (n, c[1])

    timed_loop("  SepConvGRU only", body_gru, (net, motion))

    def body_heads(c):
        d = _flow_head(up["flow_head"], c[0])
        m = 0.25 * layers.conv2d(up["mask"]["2"],
                                 layers.relu(layers.conv2d(
                                     up["mask"]["0"], c[0], padding=1)))
        return (dep(c[0], d.mean() + m.mean()), c[1])

    timed_loop("  flow+mask heads only", body_heads, (net, motion))


ALL = {
    "warp": bench_warp,
    "pallas_warp": bench_pallas_warp,
    "local_lookup": bench_local_lookup,
    "update_parts": bench_update_parts,
    "volume": bench_volume,
    "volume_fused": bench_volume_fused,
    "lookups": bench_lookups,
    "pallas_old": bench_pallas_old,
    "update": bench_update,
    "weight_head": bench_weight_head,
    "upsample": bench_upsample,
    "encoder": bench_encoder,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        try:
            ALL[n]()
        except Exception as e:  # noqa: BLE001
            print(f"{n}: ERROR {type(e).__name__}: {str(e)[:500]}",
                  flush=True)
