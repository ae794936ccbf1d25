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
    # build_track_step exposes its un-jitted body for exactly this kind of
    # re-wrapping (vmap over streams, then one jit over the mesh)
    pure = inner._raw_step

    def batched(params, states, frames):
        return jax.vmap(lambda s, f: pure(params, s, f))(states, frames)

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(batched,
                   in_shardings=(rep, dp, dp),
                   out_shardings=(dp, dp, dp),
                   donate_argnums=(1,))


def spatial_sharded_forward(mesh, cfg, iters=None):
    """jit the FULL WeightedRAFT forward with the correlation pyramid
    sharded over key columns (the ``sp`` mesh axis) — the ring-style
    scale-out for resolutions whose all-pairs volume exceeds one chip's HBM
    (SURVEY.md section 5.7; the TPU-native analog of the reference's
    never-materialize CUDA sampler, ref:raft_core/corr.py:72-100).

    Layout rationale (communication-minimal):
    - ``image2`` arrives width-sharded; the encoders run under GSPMD with
      automatic conv halo exchange, so ``fmap2`` (keys) is width-sharded.
    - each pyramid level (Q, Hl, Wl) is pinned key-columns-over-sp via the
      ``corr_shard`` hook — per-chip volume memory drops by the sp size and
      construction needs no communication (queries replicated, keys stay
      put).
    - the onehot lookup's first einsum (``qah,qhw->qaw``) keeps the sharded
      ``w`` axis as a batch dim (no comm); only the second einsum contracts
      over it, so each lookup all-reduces a tiny (Q, k+1, k+1) partial —
      ~200 KB/level at 1/8-scale 4K — over ICI.

    Pyramid impls ('onehot' recommended) shard key columns; the production
    big-frame impl ``corr_impl='local'`` shards the block-local volumes over
    their leading BLOCK axis instead — blocks are mutually independent
    (models/corr.py build_local_corr), so construction and every lookup
    partition with no volume communication at all. Levels whose sharded
    axis does not divide sp are left replicated (the pooled tail is cheap).
    Returns ``fwd(params, img1, img2) -> (flow_up, weights_up)``.
    """
    from ..models.raft import weighted_raft_forward

    assert cfg.corr_impl in ("onehot", "gather", "rowgather", "local"), (
        "spatial sharding needs a pyramid or block-local corr_impl, got "
        + cfg.corr_impl)
    sp = mesh.shape["sp"]
    if cfg.corr_impl == "local":
        # (NB*BQ, wh, ww) q-layout or (NB, wh, ww, BQ) p-layout: the
        # leading axis is blocks either way
        block_ns = NamedSharding(mesh, P("sp"))

        def shard_level(_l, corr_l):
            if corr_l.shape[0] % sp == 0:
                return jax.lax.with_sharding_constraint(corr_l, block_ns)
            return corr_l
    else:
        key_ns = NamedSharding(mesh, P(None, None, "sp"))

        def shard_level(_l, corr_l):
            if corr_l.shape[2] % sp == 0:
                return jax.lax.with_sharding_constraint(corr_l, key_ns)
            return corr_l

    def fwd(params, img1, img2):
        out = weighted_raft_forward(params, cfg, img1, img2, iters=iters,
                                    corr_shard=shard_level)
        return out["flow_up"], out["weights_up"]

    rep = NamedSharding(mesh, P())
    img_w = NamedSharding(mesh, P(None, None, "sp", None))
    return jax.jit(fwd, in_shardings=(rep, rep, img_w),
                   out_shardings=(rep, rep))


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
