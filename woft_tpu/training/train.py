"""End-to-end differentiable weight-head training through the WLS solve.

Regenerates the reference's (absent) training capability exactly as its
configs specify (ref:pytracking/optical_flow/training_configs/
v2_SNOB_large_g05.py:36-50, v2_SNOB_large_g05_RAFT.py:37-52):

- forward WeightedRAFT on a synthetic pair with known GT homography,
- tentative correspondences = coords + flow_up, subsampled to ``max_tc``,
- fit H with the differentiable weighted QR solve using sigmoid(weights_up),
- loss = mean(clip(reproj_errors(H_gt, H_est, pts), max_loss)),
- train the weight head only at lr 1e-3 (or the whole net at 1e-5 when
  ``train_flow``), lr halved per epoch.

``jax.grad`` flows through ``jnp.linalg.qr`` — the very property the torch
solvers existed for (SURVEY.md section 3.5).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..geometry.homography import find_homography_wls_qr, reproj_errors
from ..models.raft import RaftConfig, weighted_raft_forward
from ..ops.sampling import masked_sobol_gather


@dataclass(frozen=True)
class TrainConfig:
    max_tc: int = 2000           # ref: max_TC = 2000 (grid mode)
    max_loss: float = 100.0      # ref: max_loss = 100
    learning_rate: float = 1e-3  # weight-head-only
    train_flow: bool = False     # fine-tune the whole net (ref lr 1e-5)
    steps_per_epoch: int = 1000
    lr_halving: bool = True      # step 0.5 per epoch
    epe_weight: float = 0.0      # direct flow supervision vs the exact
                                 # H-induced field (from-scratch training;
                                 # 0 = pure reference loss)
    epe_clip: float = 50.0
    subsample: str = "sobol"     # 'sobol' (tracker-matched: Sobol-n of
                                 # masked, in-bounds points) | 'grid'
    sobol_n: int = 500           # tracker subsample budget (configs/WOFT.py:36)
    grad_clip: float = 1.0       # global-norm gradient clip (0 = off);
                                 # full-net fine-tuning through the QR solve
                                 # sees rare huge-residual batches


def _subsample_grid(H, W, n):
    """Deterministic ~uniform grid of <=n pixel indices (static shapes)."""
    hw = H * W
    stride = max(1, hw // n)
    idx = jnp.arange(0, stride * min(n, hw), stride)[:n]
    return jnp.clip(idx, 0, hw - 1)


def _random_rect_mask(key, H, W):
    """Random rectangular 'target mask' covering 30-90% of each dim —
    stand-in for the tracker's template mask so training subsamples from
    the same masked-region distribution the tracker serves."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    fh = jax.random.uniform(k1, (), minval=0.3, maxval=0.9)
    fw = jax.random.uniform(k2, (), minval=0.3, maxval=0.9)
    y0 = jax.random.uniform(k3, ()) * (1.0 - fh) * H
    x0 = jax.random.uniform(k4, ()) * (1.0 - fw) * W
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    return ((ys >= y0) & (ys < y0 + fh * H)
            & (xs >= x0) & (xs < x0 + fw * W))


def woft_loss(params, cfg: RaftConfig, tcfg: TrainConfig, batch):
    """Reprojection loss through the differentiable homography fit.

    With ``subsample='sobol'`` (default) the TC selection matches the
    tracker exactly: a Sobol-``sobol_n`` gather over masked, in-bounds
    points (tracker/woft.py:_select_tcs) — the weight head trains under
    the distribution it serves. ``batch['key']`` (optional) randomises
    the stand-in target masks; 'grid' keeps the round-1 stride grid."""
    out = weighted_raft_forward(params, cfg, batch["img1"], batch["img2"])
    flow = out["flow_up"]                              # (B, H, W, 2)
    weights = jax.nn.sigmoid(out["weights_up"])        # (B, H, W, 1)
    B, H, W, _ = flow.shape
    hw = H * W

    if tcfg.subsample == "sobol":
        xs = (jnp.arange(hw) % W).astype(jnp.float32)
        ys = (jnp.arange(hw) // W).astype(jnp.float32)
        src_all = jnp.stack([xs, ys], -1)              # (HW, 2)
        dst_all = src_all[None] + flow.reshape(B, hw, 2)
        inb = ((dst_all[..., 0] >= 0) & (dst_all[..., 0] <= W - 1)
               & (dst_all[..., 1] >= 0) & (dst_all[..., 1] <= H - 1))
        if "key" in batch:
            mkeys = jax.random.split(batch["key"], B)
            masks = jax.vmap(
                lambda k: _random_rect_mask(k, H, W))(mkeys)   # (B, H, W)
            valid = masks.reshape(B, hw) & inb
        else:
            valid = inb
        idx, sel = jax.vmap(
            lambda v: masked_sobol_gather(v, tcfg.sobol_n))(valid)
        sel = sel.astype(jnp.float32)                  # (B, n)
        take = jax.vmap(lambda a, i: a[i])
        src = take(jnp.broadcast_to(src_all[None], (B, hw, 2)), idx)
        dst = take(dst_all, idx)
        w = take(weights.reshape(B, hw), idx) * sel
    else:
        idx = _subsample_grid(H, W, tcfg.max_tc)       # (n,)
        xs = (idx % W).astype(jnp.float32)
        ys = (idx // W).astype(jnp.float32)
        src = jnp.broadcast_to(jnp.stack([xs, ys], -1)[None],
                               (B, idx.shape[0], 2))   # (B, n, 2)
        dst = src + flow.reshape(B, hw, 2)[:, idx]
        w = weights.reshape(B, hw)[:, idx]
        sel = jnp.ones(src.shape[:2])

    h_est = find_homography_wls_qr(src, dst, w)        # (B, 3, 3)
    pts = jnp.swapaxes(src, 1, 2)                      # (B, 2, n)
    errs = reproj_errors(batch["h_gt"], h_est, pts)    # (B, n)
    errs = jnp.clip(errs, 0.0, tcfg.max_loss) * sel
    loss = jnp.sum(errs) / jnp.maximum(jnp.sum(sel), 1.0)

    if tcfg.epe_weight:
        # dense supervision: the GT homography induces the exact flow field
        ones = jnp.ones_like(src[..., :1])
        proj = jnp.einsum("bij,bnj->bni", batch["h_gt"],
                          jnp.concatenate([src, ones], -1))
        gt_dst = proj[..., :2] / proj[..., 2:3]
        epe = jnp.linalg.norm(dst - gt_dst, axis=-1) * sel   # (B, n)
        loss = loss + tcfg.epe_weight * (
            jnp.sum(jnp.clip(epe, 0.0, tcfg.epe_clip))
            / jnp.maximum(jnp.sum(sel), 1.0))
    return loss


def _trainable_mask(params, train_flow):
    """Label pytree leaves trainable/frozen (weight-head-only by default)."""
    def mark(path_has_head, node):
        if isinstance(node, dict):
            return {k: mark(path_has_head or k in ("weight_head", "mask_head"),
                            v) for k, v in node.items()}
        return "trainable" if (train_flow or path_has_head) else "frozen"

    return mark(False, params)


def make_optimizer(params, tcfg: TrainConfig):
    # reference fine-tunes the whole net at 1e-5
    # (ref:training_configs/v2_SNOB_large_g05_RAFT.py:37-52); pass that via
    # learning_rate when fine-tuning — from-scratch runs want more.
    lr = tcfg.learning_rate
    if tcfg.lr_halving:
        schedule = optax.exponential_decay(
            lr, transition_steps=tcfg.steps_per_epoch, decay_rate=0.5,
            staircase=True)
    else:
        schedule = lr
    train_tx = optax.adamw(schedule)
    if tcfg.grad_clip:
        train_tx = optax.chain(optax.clip_by_global_norm(tcfg.grad_clip),
                               train_tx)
    tx = optax.multi_transform(
        {"trainable": train_tx, "frozen": optax.set_to_zero()},
        _trainable_mask(params, tcfg.train_flow))
    # skip (don't apply) any update with non-finite grads instead of
    # poisoning the params — one bad batch must not end a long run.
    # max_consecutive_errors must be effectively infinite: optax APPLIES
    # the non-finite update once the count is exceeded, and a diverging
    # run (observed r3: val EPE 5 -> 20 -> nan in 600 steps) emits
    # hundreds of consecutive bad steps before anyone looks at the log.
    return optax.apply_if_finite(tx, max_consecutive_errors=1_000_000_000)


def init_train_state(params, tcfg: TrainConfig):
    tx = make_optimizer(params, tcfg)
    return tx, tx.init(params)


def make_train_step(cfg: RaftConfig, tcfg: TrainConfig, tx):
    """One SGD step: (params, opt_state, batch) -> (params, opt_state, loss).

    Pure function — shard/jit it however the caller's mesh demands."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(woft_loss)(params, cfg, tcfg, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
