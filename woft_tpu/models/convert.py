"""torch ``.pth`` checkpoint -> JAX parameter pytree converter.

The reference ships flat ``state_dict`` checkpoints named
``wraft_weights-ep{NN}-end.pth`` and loads them with three knobs
(ref:pytracking/optical_flow/raft.py:54-69):

- ``add_module_to_statedict``: checkpoints saved without the DataParallel
  ``module.`` prefix (we simply normalise the prefix away),
- ``non_strict_loading``: merge what's there over a fresh init,
- ``backbone_model``: drop fnet/cnet/update_block keys so a different
  backbone's weights can be layered on.

Conversion: keys split on '.' into a nested dict; 4-D conv kernels transpose
OIHW -> HWIO. The resulting pytree indexes exactly like the torch module
tree, which the apply functions in models/raft.py mirror.
"""

import numpy as np
import jax.numpy as jnp


def _is_conv_weight(parts, value):
    return parts[-1] == "weight" and getattr(value, "ndim", 0) == 4


def torch_statedict_to_params(state_dict):
    """Flat ``{'fnet.layer1.0.conv1.weight': tensor}`` -> nested jnp pytree."""
    params = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key.endswith("num_batches_tracked"):
            continue    # integer BN step counter: unused at eval, breaks grad
        parts = key.split(".")
        arr = np.asarray(value)
        if _is_conv_weight(parts, arr):
            arr = arr.transpose(2, 3, 1, 0)       # OIHW -> HWIO
        node = params
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(arr)
    return params


def params_to_torch_statedict(params):
    """Inverse conversion (for checkpoint export / round-trip tests).

    The reference encoder registers its downsample-shortcut norm twice —
    as ``downsample.1`` AND as ``norm3`` (residual blocks) / ``norm4``
    (bottleneck blocks), the same module object
    (ref:raft_core/extractor.py:40-45,103-105) — so its state_dicts carry
    both key families with identical tensors. Emit the aliases too, so an
    exported checkpoint strict-loads into the torch model."""
    flat = {}

    def walk(node, prefix):
        if "running_mean" in node:
            # BatchNorm: re-emit the integer step counter the import
            # dropped, so strict torch loads see a complete module
            flat[f"{prefix}.num_batches_tracked" if prefix
                 else "num_batches_tracked"] = np.asarray(0, np.int64)
        for key, value in node.items():
            path = f"{prefix}.{key}" if prefix else key
            if isinstance(value, dict):
                walk(value, path)
                if key == "downsample" and "1" in value:
                    alias = "norm4" if "conv3" in node else "norm3"
                    apre = f"{prefix}.{alias}" if prefix else alias
                    if value["1"]:
                        flat[f"{apre}.num_batches_tracked"] = np.asarray(
                            0, np.int64)
                    for p, v in value["1"].items():
                        flat[f"{apre}.{p}"] = np.asarray(v)
            else:
                arr = np.asarray(value)
                if key == "weight" and arr.ndim == 4:
                    arr = arr.transpose(3, 2, 0, 1)   # HWIO -> OIHW
                flat[path] = arr

    walk(params, "")
    return flat


def _merge(dst, src):
    for key, value in src.items():
        if isinstance(value, dict) and isinstance(dst.get(key), dict):
            _merge(dst[key], value)
        else:
            dst[key] = value


_BACKBONE_PREFIXES = ("fnet", "cnet", "update_block")


def load_torch_checkpoint(path, init_params=None, *, drop_backbone=False,
                          non_strict=False):
    """Load a reference ``.pth`` checkpoint into a JAX parameter pytree.

    Args:
        path: checkpoint path (flat state_dict, torch format).
        init_params: freshly initialised pytree to merge over when
            ``non_strict`` (or when ``drop_backbone`` leaves holes).
        drop_backbone: drop fnet/cnet/update_block keys
            (the reference's ``backbone_model`` option).
        non_strict: tolerate missing/extra keys by merging over
            ``init_params``.
    """
    import torch
    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    if drop_backbone:
        state_dict = {k: v for k, v in state_dict.items()
                      if not any(s in k for s in _BACKBONE_PREFIXES)}
    converted = torch_statedict_to_params(
        {k: v.numpy() for k, v in state_dict.items()})
    if init_params is not None and (non_strict or drop_backbone):
        import copy
        merged = copy.deepcopy(init_params)
        _merge(merged, converted)
        return merged
    return converted
