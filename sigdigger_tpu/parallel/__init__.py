from sigdigger_tpu.parallel import distributed
from sigdigger_tpu.parallel.sharding import (
    make_mesh,
    shard_pipeline,
    sharded_pipeline_step,
)

__all__ = ["make_mesh", "shard_pipeline", "sharded_pipeline_step",
           "distributed"]
