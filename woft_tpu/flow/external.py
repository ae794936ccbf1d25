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
        self.backend_fn = config.backend_fn
        from ..models.convert import load_torch_checkpoint
        self.params = load_torch_checkpoint(str(config.model))

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
