#!/usr/bin/env python
"""Train the WeightedRAFT weight head on synthetic homography pairs.

Regenerates the reference's absent trainer (named in
ref:optical_flow/training_configs/v2_SNOB_large_g05.py:39-41): images from a
directory (any corpus — COCO, video frames) are warped by random
homographies on device; the weight head trains end-to-end through the
differentiable weighted-QR homography fit with the clipped reprojection
loss. ``--train-flow`` fine-tunes the whole network at lr 1e-5.

Example:
    python train_wraft.py --images /data/coco --size 288x384 --batch 8 \
        --steps 2000 --out weights/wraft_tpu
"""

import argparse
import glob
import logging
import os
import time
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def parse_args():
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--images", required=True,
                   help="directory of training images (jpg/png); a comma "
                        "list pools several directories")
    p.add_argument("--size", default="288x384",
                   help="train crop HxW (/8); a comma-separated list "
                        "(e.g. 288x384,448x576) cycles sizes per step — "
                        "multi-scale batches, one cached XLA graph each")
    p.add_argument("--batch", default="4",
                   help="batch size; a comma list pairs with --size sizes "
                        "(e.g. 8,4 — smaller batches for larger crops)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--steps-per-epoch", type=int, default=500,
                   help="lr halves every epoch (ref schedule)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--train-flow", action="store_true",
                   help="train the whole net (reference fine-tune: 1e-5)")
    p.add_argument("--epe-weight", type=float, default=0.0,
                   help="dense EPE supervision weight (from-scratch runs)")
    p.add_argument("--grad-clip", type=float, default=1.0,
                   help="global-norm gradient clip (0 = off)")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--small", action="store_true",
                   help="tiny 'small' RAFT variant — smokes/tests only")
    p.add_argument("--init", type=Path,
                   help="torch .pth or orbax checkpoint to start from")
    p.add_argument("--out", type=Path, default=Path("weights/wraft_tpu"))
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--max-shift", type=float, default=0.2,
                   help="synth corner-shift fraction (smaller = easier)")
    p.add_argument("--min-shift", type=float, default=0.0,
                   help="if >0, sample the per-step corner shift "
                        "log-uniformly in [min-shift, max-shift] — mixes "
                        "prewarp-residual (small) and redetection (large) "
                        "motion magnitudes")
    p.add_argument("--max-translation", type=float, default=0.1)
    p.add_argument("--scale-jitter", type=float, default=1.0,
                   help="if >1, sample source crops up to this factor "
                        "larger and resize down to --size (matches the "
                        "window tracker's crop-resample distribution)")
    p.add_argument("--grid-subsample", action="store_true",
                   help="round-1 stride-grid TC subsampling instead of the "
                        "tracker-matched Sobol-500 over masked points")
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="save a rolling checkpoint every N steps")
    p.add_argument("--val-every", type=int, default=0,
                   help="log held-out EPE every N steps")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel devices (0 = single device)")
    return p.parse_args()


def image_stream(paths, hw, batch, rng, scale_jitter=1.0):
    """Host-side decode + random-crop batcher.

    ``scale_jitter > 1`` samples crops up to that factor larger than the
    target size and resizes them down — reproducing the window tracker's
    crop-resample blur (search bboxes larger than the fixed window are
    downsampled into it, tracker/window_step.py)."""
    import cv2
    H, W = hw
    while True:
        imgs = []
        while len(imgs) < batch:
            path = paths[rng.integers(len(paths))]
            img = cv2.imread(str(path))
            if img is None or img.shape[0] < H or img.shape[1] < W:
                continue
            s = 1.0
            if scale_jitter > 1.0:
                s_max = min(scale_jitter, img.shape[0] / H, img.shape[1] / W)
                s = float(np.exp(rng.uniform(0.0, np.log(max(s_max, 1.0)))))
            ch, cw = int(round(H * s)), int(round(W * s))
            y = rng.integers(img.shape[0] - ch + 1)
            x = rng.integers(img.shape[1] - cw + 1)
            crop = img[y:y + ch, x:x + cw, ::-1]
            if s != 1.0:
                crop = cv2.resize(crop, (W, H), interpolation=cv2.INTER_AREA)
            imgs.append(crop.astype(np.float32))
        yield np.stack(imgs)


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(levelname)s:%(message)s")

    import jax
    import jax.numpy as jnp
    from woft_tpu.models.raft import RaftConfig, init_raft_params
    from woft_tpu.models.checkpoint import save_checkpoint
    from woft_tpu.training.synth import synth_homography_batch
    from woft_tpu.training.train import (TrainConfig, init_train_state,
                                         make_train_step)

    sizes = [tuple(int(v) for v in s.split("x"))
             for s in args.size.split(",")]
    assert all(H % 8 == 0 and W % 8 == 0 for H, W in sizes)
    batches = [int(b) for b in str(args.batch).split(",")]
    if len(batches) == 1:
        batches = batches * len(sizes)
    assert len(batches) == len(sizes), "--batch list must pair with --size"

    cfg = RaftConfig(variant="weighted", iters=args.iters,
                     precision="default", small=args.small,
                     **({"weight_head_structure": ((32, 3),)}
                        if args.small else {}))
    tcfg = TrainConfig(learning_rate=args.lr, train_flow=args.train_flow,
                       steps_per_epoch=args.steps_per_epoch,
                       epe_weight=args.epe_weight,
                       subsample="grid" if args.grid_subsample else "sobol",
                       grad_clip=args.grad_clip)

    params = init_raft_params(jax.random.PRNGKey(args.seed), cfg)
    if args.init:
        if str(args.init).endswith((".pth", ".pt")):
            from woft_tpu.models.convert import load_torch_checkpoint
            params = load_torch_checkpoint(str(args.init), params,
                                           non_strict=True)
        else:
            from woft_tpu.models.checkpoint import load_checkpoint
            params = load_checkpoint(args.init, like=params)

    tx, opt_state = init_train_state(params, tcfg)

    if args.dp > 1:
        from woft_tpu.parallel.mesh import make_mesh, replicate, shard_batch
        from woft_tpu.parallel.sharding import sharded_train_step
        mesh = make_mesh(args.dp, sp=1)
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        step = sharded_train_step(mesh, cfg, tcfg, tx, with_key=True)

        def prep(batch):
            key = batch.pop("key", None)
            batch = shard_batch(mesh, batch)
            if key is not None:
                batch["key"] = replicate(mesh, key)
            return batch
    else:
        step = jax.jit(make_train_step(cfg, tcfg, tx),
                       donate_argnums=(0, 1))
        prep = lambda b: b  # noqa: E731

    paths = sorted(sum((glob.glob(str(Path(d) / f"*.{e}"))
                        for d in str(args.images).split(",")
                        for e in ("jpg", "jpeg", "png")), []))
    if not paths:
        raise SystemExit(f"no images under {args.images}")
    logger.info("%d training images", len(paths))

    rng = np.random.default_rng(args.seed)
    # one host-side batcher per crop size; sizes cycle round-robin per step
    # (multi-scale batches — each (H,W,B) is its own cached XLA graph)
    streams = [image_stream(paths, hw, b, rng,
                            scale_jitter=args.scale_jitter)
               for hw, b in zip(sizes, batches)]
    key = jax.random.PRNGKey(args.seed + 1)

    # synth under jit with the shift as a traced scalar: per-step motion
    # magnitudes (the --min-shift mixture) don't retrace
    synth = jax.jit(lambda k, imgs, shift: synth_homography_batch(
        k, imgs, max_corner_shift=shift,
        max_translation=args.max_translation))

    # held-out validation batch with a fixed key: mean flow EPE vs the
    # exact H-induced field
    val_images = jnp.asarray(next(streams[0]))
    val_batch = synth_homography_batch(
        jax.random.PRNGKey(12345), val_images,
        max_corner_shift=args.max_shift,
        max_translation=args.max_translation)

    @jax.jit
    def val_epe(params):
        from woft_tpu.models.raft import weighted_raft_forward
        out = weighted_raft_forward(params, cfg, val_batch["img1"],
                                    val_batch["img2"])
        flow = out["flow_up"]
        B, Hh, Ww, _ = flow.shape
        ys, xs = jnp.meshgrid(jnp.arange(Hh, dtype=jnp.float32),
                              jnp.arange(Ww, dtype=jnp.float32),
                              indexing="ij")
        grid = jnp.stack([xs, ys, jnp.ones_like(xs)], -1).reshape(-1, 3)
        proj = jnp.einsum("bij,nj->bni", val_batch["h_gt"], grid)
        gt_flow = (proj[..., :2] / proj[..., 2:3]
                   - grid[None, :, :2]).reshape(B, Hh, Ww, 2)
        return jnp.mean(jnp.linalg.norm(flow - gt_flow, axis=-1))

    t0 = time.time()
    for i in range(args.steps):
        key, sub, mkey = jax.random.split(key, 3)
        if args.min_shift > 0:
            shift = float(np.exp(rng.uniform(np.log(args.min_shift),
                                             np.log(args.max_shift))))
        else:
            shift = args.max_shift
        batch = synth(sub, jnp.asarray(next(streams[i % len(streams)])),
                      jnp.float32(shift))
        batch["key"] = mkey
        params, opt_state, loss = step(params, opt_state, prep(batch))
        if i % args.log_every == 0:
            loss_f = float(loss)
            logger.info("step %d  loss %.4f  (%.2f s/step)", i, loss_f,
                        (time.time() - t0) / max(i, 1))
            if not np.isfinite(loss_f):
                # A non-finite loss can be a single degenerate batch whose
                # update apply_if_finite already skipped (params still
                # good) — only halt if the params themselves are poisoned,
                # preserving the last good rolling checkpoint (r3 lesson:
                # a diverged run saved nan weights at the next ckpt_every).
                leaves = jax.tree.leaves(params)
                params_ok = all(bool(jnp.all(jnp.isfinite(l)))
                                for l in leaves)
                if params_ok:
                    logger.warning("non-finite loss at step %d but params "
                                   "finite — degenerate batch, update "
                                   "skipped by apply_if_finite; continuing",
                                   i)
                else:
                    logger.error("non-finite loss AND non-finite params at "
                                 "step %d — halting; last rolling "
                                 "checkpoint is the survivor", i)
                    return 1
        if args.val_every and i % args.val_every == 0:
            logger.info("step %d  val EPE %.3f px", i, float(val_epe(params)))
        if args.ckpt_every and i and i % args.ckpt_every == 0:
            save_checkpoint(args.out, params)
            logger.info("rolling checkpoint @ step %d", i)

    out = save_checkpoint(args.out, params)
    logger.info("saved checkpoint to %s", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
