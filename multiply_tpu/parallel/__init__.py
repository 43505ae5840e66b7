from .sharding import (
    make_mesh,
    replicate,
    shard_rays,
    sharded_train_step,
)

__all__ = ["make_mesh", "replicate", "shard_rays", "sharded_train_step"]
