"""Native checkpoint save/load (orbax) for WOFT-TPU parameters.

The reference stores flat torch ``state_dict`` .pth files named
``wraft_weights-ep{NN}-end.pth`` (ref:optical_flow/configs/*:19); here the
native format is an orbax StandardCheckpoint of the parameter pytree, plus
round-trip export to the torch layout via models.convert for
interoperability.
"""

import logging
import os

import jax

logger = logging.getLogger(__name__)


def save_checkpoint(path, params, *, force=True):
    """Save a parameter pytree to ``path`` (orbax directory)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(str(path))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=force)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path, like=None):
    """Restore a parameter pytree; ``like`` provides the target structure
    (abstract restore).

    Restores onto the current default device regardless of the device the
    checkpoint was saved from (a TPU-saved checkpoint must load in CPU
    sessions and vice versa); callers that want a mesh layout re-shard
    after loading (parallel.mesh.replicate)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(str(path))
    ckptr = ocp.StandardCheckpointer()
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    if like is None:
        try:
            like = ckptr.metadata(path).item_metadata
        except (FileNotFoundError, KeyError, ValueError, TypeError):
            # older layout without readable metadata — the sharding-less
            # restore only works when saved and current devices match
            logger.warning(
                "checkpoint %s has no readable metadata; falling back to a "
                "sharding-less restore (cross-device restores may fail)",
                path)
            return ckptr.restore(path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
        like)
    return ckptr.restore(path, abstract)


def export_torch_pth(path, params):
    """Export params to a reference-compatible flat .pth state_dict."""
    import torch
    from .convert import params_to_torch_statedict
    flat = params_to_torch_statedict(params)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in flat.items()},
               str(path))
    return path
