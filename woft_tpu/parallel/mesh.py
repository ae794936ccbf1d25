"""Device mesh and sharding helpers.

The reference has no multi-device story (SURVEY.md section 2.10); here the
entire distributed backend is ``jax.sharding``: a 2-D mesh with a ``dp``
(data: streams/targets/pairs) axis and an ``sp`` (spatial: image width)
axis. XLA's SPMD partitioner inserts the halo exchanges for spatially
sharded convolutions and the collectives for cross-device reductions — all
riding ICI within a slice.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, sp=1, devices=None):
    """(dp, sp) mesh over the first ``n_devices`` devices.

    ``sp`` is the spatial-sharding width; dp = n_devices // sp."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % sp == 0, (n_devices, sp)
    return Mesh(devices.reshape(n_devices // sp, sp), ("dp", "sp"))


def shard_batch(mesh, tree, spatial_axis=None):
    """Shard every array's leading dim over ``dp`` (and optionally one
    spatial dim over ``sp``)."""
    sp_size = mesh.shape["sp"]

    def spec_for(x):
        spec = [None] * x.ndim
        spec[0] = "dp"
        # spatial-shard image-like arrays only (divisible spatial dim)
        if (spatial_axis is not None and x.ndim >= 4
                and x.shape[spatial_axis] % sp_size == 0):
            spec[spatial_axis] = "sp"
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(lambda x: jax.device_put(x, spec_for(x)), tree)


def replicate(mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
