"""Sharded training / tracking entry points.

Three scale-out paths (SURVEY.md sections 2.10, 5.7, 5.8):

- ``sharded_train_step``: data-parallel (+ optional spatial) training with
  replicated params; gradients all-reduce over ICI automatically via the
  SPMD partitioner.
- ``sharded_track_batch``: many independent video streams tracked in a
  data-parallel batch (the embarrassingly-parallel axis; DCN-friendly).
- ``spatial_sharded_correlation``: the ring-style analog for resolutions
  whose all-pairs volume exceeds one chip — fmap2 rows sharded over ``sp``,
  each shard computes its slice of the correlation rows; lookups gather from
  the full row only after a width-axis all_gather of the *pooled* pyramid
  (cheap: pooled levels are 1/4, 1/16, ... of level 0).
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def sharded_train_step(mesh, cfg, tcfg, tx, with_key=False):
    """jit a training step with batch sharded (dp, sp) and replicated params.

    Returns ``step(params, opt_state, batch)`` — batch arrays sharded
    batch-over-dp, width-over-sp; XLA inserts halo exchange for the convs
    and psum for the gradient reduction. ``with_key=True`` admits the
    replicated PRNG key the Sobol-mask subsampling uses (training/train.py).
    """
    from ..training.train import make_train_step

    step = make_train_step(cfg, tcfg, tx)
    batch_spec = {
        "img1": NamedSharding(mesh, P("dp", None, "sp", None)),
        "img2": NamedSharding(mesh, P("dp", None, "sp", None)),
        "h_gt": NamedSharding(mesh, P("dp", None, None)),
    }
    if with_key:
        batch_spec["key"] = NamedSharding(mesh, P())
    rep = NamedSharding(mesh, P())
    return jax.jit(step,
                   in_shardings=(rep, rep, batch_spec),
                   out_shardings=(rep, rep, rep),
                   donate_argnums=(0, 1))


def sharded_track_batch(mesh, raft_cfg, tp, flow_fn=None):
    """jit the tracker step over a dp-sharded batch of streams.

    State pytrees carry a leading batch dim; each stream's state/frame lives
    on its dp shard. Returns ``step(params, states, frames)`` with the same
    (state, H, meta) contract as ``build_track_step`` but batched.
    """
    from ..tracker.woft import build_track_step

    inner = build_track_step(raft_cfg, tp, flow_fn=flow_fn)
    # build_track_step returns a jitted fn; take its wrapped pure function
    pure = inner.__wrapped__

    def batched(params, states, frames):
        return jax.vmap(lambda s, f: pure(params, s, f))(states, frames)

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(batched,
                   in_shardings=(rep, dp, dp),
                   out_shardings=(dp, dp, dp),
                   donate_argnums=(1,))


def spatial_sharded_correlation(mesh, fmap1, fmap2):
    """All-pairs correlation with fmap2 (keys) sharded over ``sp``.

    fmap1/fmap2: (B, H, W, D). The (B*H*W, H, W) volume comes out sharded
    over its *last* (key-column) axis — each chip holds the correlation of
    every query against its shard of fmap2 columns. Memory per chip drops by
    the sp size; the einsum needs no communication at all (queries are
    replicated, keys stay put).
    """
    from ..models.corr import all_pairs_correlation

    def f(f1, f2):
        return all_pairs_correlation(f1, f2)

    sharded = jax.jit(
        f,
        in_shardings=(NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(None, None, "sp", None))),
        out_shardings=NamedSharding(mesh, P(None, None, "sp")))
    return sharded(fmap1, fmap2)
