"""The ``compute_flow`` wrapper protocol around the flow networks.

TPU-native rework of ref:pytracking/optical_flow/raft.py:29-218. The torch
wrapper does per-call host work (BGR->RGB, upload, pad, forward, unpad,
sigmoid, TC conversion); here the whole post-upload pipeline is one jitted
function per static input shape, and the TC conversion keeps everything
dense + static-shape (coords are the implicit raster grid; downstream
masking is weight-based).

Protocol (mirrors the reference docstring, ref:optical_flow/raft.py:83-90):
- inputs: (H, W, 3) uint8 BGR numpy images of equal shape (host API), or
  (B, H, W, 3) float RGB device arrays (device API).
- ``mode='flow'`` -> dense flow (H, W, 2) + weights (H, W) [+ mask].
- ``mode='TC'``   -> (src_coords (2, HW), dst_coords (2, HW), weights
  (1, HW)) — full-field; subsampling/masking happen downstream.
"""

import functools
import logging

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.pad import make_padder
from ..ops.sampling import featuremap_coords
from ..models.raft import RaftConfig, weighted_raft_forward

logger = logging.getLogger(__name__)


def sigmoid(x):
    if x is None:
        return None
    return jax.nn.sigmoid(x) if isinstance(x, jnp.ndarray) else \
        1.0 / (1.0 + np.exp(-x))


class FlowResult:
    """Dense flow + reliability weights for one frame pair (device arrays)."""

    def __init__(self, flow, weights=None, mask=None):
        self.flow = flow          # (B, H, W, 2)
        self.weights = weights    # (B, H, W, 1) or None
        self.mask = mask          # (B, H, W, 1) or None


class RaftFlow:
    """Host-facing flow wrapper with a fully-jitted device pipeline.

    Config surface mirrors the reference flow configs
    (ref:optical_flow/configs/v2_SNOB_large_g05_RAFT.py): ``raft_type``,
    ``iters``, ``padding_mode``, ``model`` (checkpoint path), loader options.
    """

    def __init__(self, config):
        self.C = config
        cp = config.class_params
        variant = {"orig": "orig", "weighted": "weighted",
                   "weighted_masked": "weighted_masked"}[config.raft_type]
        whs = cp.weight_head_structure or ()
        mhs = cp.mask_head_structure or (
            [(128, 3), (128, 3), (128, 3)]
            if variant == "weighted_masked" else ())
        self.cfg = RaftConfig(
            small=bool(cp.small),
            variant=variant,
            iters=int(config.iters or 12),
            weight_head_structure=tuple(
                tuple(s) if isinstance(s, (list, tuple)) else s for s in whs),
            mask_head_structure=tuple(
                tuple(s) if isinstance(s, (list, tuple)) else s for s in mhs),
            precision=str(config.precision) if config.precision else "highest",
            corr_impl=str(config.corr_impl) if config.corr_impl else "onehot",
            alternate_corr=bool(cp.alternate_corr),
            local_margin=int(config.local_margin or 16),
        )
        self.padding_mode = config.padding_mode or "nopad"
        self.params = self._load_params(config)
        self._jitted = {}

    def _load_params(self, config):
        from ..models.convert import load_torch_checkpoint
        from ..models.raft import init_raft_params
        model_path = config.model
        if model_path and str(model_path).endswith((".pth", ".pt")):
            import os
            if os.path.exists(str(model_path)):
                logger.info("Loading torch checkpoint %s", model_path)
                init = None
                if config.non_strict_loading or config.backbone_model:
                    init = init_raft_params(jax.random.PRNGKey(0), self.cfg)
                return load_torch_checkpoint(
                    str(model_path), init,
                    drop_backbone=bool(config.backbone_model),
                    non_strict=bool(config.non_strict_loading))
            logger.warning("Checkpoint %s missing; using seeded random init "
                           "(reference ships without these blobs, "
                           "ref:.MISSING_LARGE_BLOBS)", model_path)
        elif model_path:
            import os
            if os.path.exists(str(model_path)):
                from ..models.checkpoint import load_checkpoint
                logger.info("Loading orbax checkpoint %s", model_path)
                init = init_raft_params(jax.random.PRNGKey(0), self.cfg)
                try:
                    return load_checkpoint(str(model_path), like=init)
                except Exception:
                    # structure mismatch (e.g. a 'weighted' checkpoint
                    # under a 'weighted_masked' config): restore the saved
                    # tree and merge what exists, keep init for the rest
                    restored = load_checkpoint(str(model_path))

                    def merge(node, rest):
                        if isinstance(node, dict):
                            return {k: merge(v, rest[k]) if k in rest else v
                                    for k, v in node.items()}
                        return jnp.asarray(rest)

                    logger.warning(
                        "checkpoint %s is a partial match; merging "
                        "overlapping subtrees non-strictly", model_path)
                    return merge(init, restored)
            logger.warning("Checkpoint %s missing; using seeded random init",
                           model_path)
        return init_raft_params(jax.random.PRNGKey(0), self.cfg)

    # ------------------------------------------------------------------
    # device pipeline
    # ------------------------------------------------------------------

    def _pipeline(self, shape):
        """Jitted (params, src, dst) -> (flow, weights, mask) for one static
        shape. Padding policy folded in."""
        key = shape
        if key in self._jitted:
            return self._jitted[key]

        padding_mode = self.padding_mode
        cfg = self.cfg

        @functools.partial(jax.jit, static_argnums=())
        def run(params, src, dst):
            padder = make_padder(padding_mode, src.shape)
            psrc, pdst = padder.pad(src, dst)
            out = weighted_raft_forward(params, cfg, psrc, pdst)
            flow = padder.unpad(out["flow_up"])
            weights = padder.unpad(out.get("weights_up"))
            mask = padder.unpad(out.get("mask_up"))
            return flow, weights, mask

        self._jitted[key] = run
        return run

    def compute_flow_device(self, src, dst, do_sigmoid=False):
        """(B, H, W, 3) float RGB device arrays -> FlowResult."""
        run = self._pipeline(tuple(src.shape))
        flow, weights, mask = run(self.params, src, dst)
        if do_sigmoid:
            weights = sigmoid(weights)
            mask = sigmoid(mask)
        return FlowResult(flow, weights, mask)

    # ------------------------------------------------------------------
    # host protocol (reference-compatible)
    # ------------------------------------------------------------------

    def compute_flow(self, src_img, dst_img, mode="TC", vis=False,
                     src_img_identifier=None, numpy_out=False,
                     do_sigmoid=False):
        """Reference-compatible entry (ref:optical_flow/raft.py:81-218)."""
        assert mode in ("flow", "TC")
        assert src_img.shape == dst_img.shape

        result = None
        if src_img_identifier is not None and self.C.flow_cache_dir:
            from .cache import FlowCache
            try:
                cache = FlowCache(self.C.flow_cache_dir)
                flow_np, weights_np = cache.load(src_img, src_img_identifier)
                result = FlowResult(
                    jnp.asarray(flow_np)[None],
                    None if weights_np is None
                    else jnp.asarray(weights_np)[None, ..., None])
                logger.debug("Using pre-computed flow.")
            except Exception as ex:  # noqa: BLE001 — cache miss is routine
                logger.debug("no cached flow: %s", ex)

        if result is None:
            src = jnp.asarray(src_img[:, :, ::-1].astype(np.float32))[None]
            dst = jnp.asarray(dst_img[:, :, ::-1].astype(np.float32))[None]
            result = self.compute_flow_device(src, dst, do_sigmoid=False)
        if self.C.weights_postprocessing_fn:
            result.weights = self.C.weights_postprocessing_fn(result.weights)
        if do_sigmoid:
            result.weights = sigmoid(result.weights)
            result.mask = sigmoid(result.mask)

        weighted = self.cfg.variant in ("weighted", "weighted_masked")
        H, W = src_img.shape[:2]
        if mode == "flow":
            flow = jnp.transpose(result.flow[0], (2, 0, 1))       # (2, H, W)
            weights = (result.weights[0, ..., 0] if weighted else None)
            mask = (result.mask[0, ..., 0]
                    if result.mask is not None else None)
            outs = [flow, weights] + ([mask] if self.cfg.variant ==
                                      "weighted_masked" else [])
        else:
            src_coords = featuremap_coords((H, W))                # (2, HW)
            flow_flat = result.flow[0].reshape(-1, 2).T           # (2, HW)
            dst_coords = src_coords + flow_flat
            weights = (result.weights[0].reshape(1, -1) if weighted else None)
            mask = (result.mask[0].reshape(1, -1)
                    if result.mask is not None else None)
            outs = [src_coords, dst_coords, weights] + (
                [mask] if self.cfg.variant == "weighted_masked" else [])

        if numpy_out:
            outs = [None if o is None else np.asarray(o) for o in outs]
        return tuple(outs)
