from rlenv_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_params,
    replicate,
)

__all__ = ["make_mesh", "shard_batch", "shard_params", "replicate"]
