"""External-backend flow support: weight head over a local cost volume.

TPU twin of ref:pytracking/optical_flow/mm.py: the reference grabs
LiteFlowNet2's 7x7 local correlation cost volume with a forward hook and
scores flow reliability with a small separately-trained ``WeightHead``
(conv stack over per-pixel 7x7 patches, mean-pooled to a logit). The
LiteFlowNet2 backbone itself lives in an mmflow fork that is not shipped
upstream (SURVEY.md section 2.9); here the backend is pluggable — any
callable producing ``(flow, cost_volume)`` — and the weight head loads the
ONE real checkpoint the reference ships
(weights/liteflownet2_v2/wraft_weights-ep04-end.pth, keys net.0/2/4/6).
"""

import logging

import numpy as np
import jax
import jax.numpy as jnp

from ..models import layers
from ..ops.warp import upsample2d_align_corners

logger = logging.getLogger(__name__)


def cost_volume_weight_head(params, cost_volume, patch=7):
    """Reliability logits from a local correlation cost volume.

    Mirrors ref:optical_flow/mm.py:133-190: per source pixel the (patch x
    patch) correlation responses form a tiny image; a conv stack + spatial
    mean produce one logit.

    Args:
        params: {'net': {'0': conv, '2': conv, '4': conv, '6': conv}} —
            the shipped checkpoint layout (converted via models.convert).
        cost_volume: (B, Hf, Wf, patch*patch).
    Returns:
        (B, Hf, Wf, 1) logits.
    """
    B, Hf, Wf, kk = cost_volume.shape
    assert kk == patch * patch, (kk, patch)
    x = cost_volume.reshape(B * Hf * Wf, patch, patch, 1)
    net = params["net"]
    x = layers.relu(layers.conv2d(net["0"], x, padding=1))
    x = layers.relu(layers.conv2d(net["2"], x, padding=1))
    x = layers.relu(layers.conv2d(net["4"], x, padding=1))
    x = layers.conv2d(net["6"], x)
    logits = jnp.mean(x, axis=(1, 2))                 # (BHW, 1)
    return logits.reshape(B, Hf, Wf, 1)


def local_cost_volume(fmap1, fmap2, patch=7, precision=None):
    """Windowed correlation between feature maps (zero padding), channel
    layout matching the hooked mmflow volume: c = dy*patch + dx.

    fmap1, fmap2: (B, Hf, Wf, D). Returns (B, Hf, Wf, patch*patch)."""
    r = patch // 2
    B, H, W, D = fmap1.shape
    f2 = jnp.pad(fmap2, ((0, 0), (r, r), (r, r), (0, 0)))
    outs = []
    for dy in range(patch):
        for dx in range(patch):
            shifted = f2[:, dy:dy + H, dx:dx + W, :]
            outs.append(jnp.sum(fmap1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1) / np.sqrt(D)


def make_raft_backend(config):
    """Default external backend: an 'orig' RAFT (no built-in weight head —
    the LiteFlowNet2 role) producing flow plus the 7x7 local cost volume
    at 1/8 resolution from its feature maps.

    The reference's LiteFlowNet2 lives in an mmflow fork that is not
    shipped (SURVEY.md section 2.9); this backend reproduces the *shape* of
    that pipeline — external flow net + hooked local cost volume
    (ref:optical_flow/mm.py:21-34) — with a TPU-native flow net, so the
    ablation_10-12 configs are runnable end to end."""
    from ..models.raft import (RaftConfig, init_raft_params,
                               weighted_raft_forward)
    from ..ops.pad import make_padder

    cfg = RaftConfig(variant="orig",
                     iters=int(config.backend_iters or 12),
                     precision=str(config.precision or "highest"))
    model_path = config.backend_model
    params = init_raft_params(jax.random.PRNGKey(0), cfg)
    if model_path:
        import os
        if str(model_path).endswith((".pth", ".pt")):
            if os.path.exists(str(model_path)):
                from ..models.convert import load_torch_checkpoint
                params = load_torch_checkpoint(str(model_path), params,
                                               non_strict=True)
            else:
                logger.warning("backend checkpoint %s missing; random init",
                               model_path)
        elif os.path.exists(str(model_path)):
            from ..models.checkpoint import load_checkpoint
            restored = load_checkpoint(str(model_path))
            # a weighted-RAFT checkpoint is a superset of the orig
            # backbone: intersect trees, keep init for absent keys

            def merge(init, rest):
                if isinstance(init, dict):
                    return {k: merge(v, rest[k]) if k in rest else v
                            for k, v in init.items()}
                return jnp.asarray(rest)

            params = merge(params, restored)
        else:
            logger.warning("backend checkpoint %s missing; random init",
                           model_path)
    patch = int(config.patch or 7)
    padding_mode = str(config.padding_mode or "nopad")

    def backend(img1, img2):
        padder = make_padder(padding_mode, img1.shape)
        p1, p2 = padder.pad(img1, img2)
        out = weighted_raft_forward(params, cfg, p1, p2)
        cv = local_cost_volume(out["fmap1"], out["fmap2"], patch)
        return padder.unpad(out["flow_up"]), cv

    return backend


class ExternalFlowWrapper:
    """compute_flow protocol around a pluggable external flow backend.

    config:
        backend_fn: callable(src_rgb (1,H,W,3), dst_rgb) ->
            (flow (1,H,W,2), cost_volume (1,Hf,Wf,patch*patch)).
        model: path to the weight-head checkpoint (.pth), e.g. the shipped
            liteflownet2_v2 weights.
        patch: local window size (7).
    """

    def __init__(self, config):
        self.C = config
        self.patch = int(config.patch or 7)
        self.backend_fn = config.backend_fn or make_raft_backend(config)
        if config.use_weight_head is False:
            # ablation_10/11: flow without the reliability head
            # (ref:configs/WOFT_liteflownet2_noweights.py)
            self.params = {}
        else:
            from ..models.convert import load_torch_checkpoint
            self.params = load_torch_checkpoint(str(config.model))

    def make_flow_fn(self):
        """Jittable (flow, weights) fn with the tracker flow seam signature
        (tracker/woft.py build_track_step): images are (1, H, W, 3) f32 RGB
        device arrays; weights come from the external cost-volume head
        (uniform 1s in the 'noweights' ablations)."""
        head_params = self.params
        backend = self.backend_fn
        patch = self.patch
        use_head = bool(head_params)

        def flow_fn(params, img1, img2, template_feats=None):
            del params, template_feats
            flow, cost_volume = backend(img1, img2)
            if use_head:
                logits = cost_volume_weight_head(head_params, cost_volume,
                                                 patch)
                weights = jax.nn.sigmoid(
                    upsample2d_align_corners(logits, img2.shape[1:3]))
            else:
                weights = jnp.ones_like(flow[..., :1])
            return flow, weights

        return flow_fn

    def compute_flow(self, src_img, dst_img, mode="TC", vis=False,
                     src_img_identifier=None, numpy_out=False,
                     do_sigmoid=False):
        assert mode in ("flow", "TC")
        src = jnp.asarray(src_img[:, :, ::-1].astype(np.float32))[None]
        dst = jnp.asarray(dst_img[:, :, ::-1].astype(np.float32))[None]
        flow, cost_volume = self.backend_fn(src, dst)
        logits = cost_volume_weight_head(self.params, cost_volume,
                                         self.patch)
        H, W = src_img.shape[:2]
        weights = upsample2d_align_corners(logits, (H, W))
        if do_sigmoid:
            weights = jax.nn.sigmoid(weights)

        if mode == "flow":
            out = (jnp.transpose(flow[0], (2, 0, 1)), weights[0, ..., 0])
        else:
            from ..ops.sampling import featuremap_coords
            src_coords = featuremap_coords((H, W))
            dst_coords = src_coords + flow[0].reshape(-1, 2).T
            out = (src_coords, dst_coords, weights[0].reshape(1, -1))
        if numpy_out:
            out = tuple(None if o is None else np.asarray(o) for o in out)
        return out
