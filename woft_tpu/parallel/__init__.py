from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
from .sharding import (  # noqa: F401
    sharded_train_step,
    sharded_track_batch,
    spatial_sharded_correlation,
)
