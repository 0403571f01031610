from sigdigger_tpu.parallel import distributed
from sigdigger_tpu.parallel.banks import (
    make_ch_mesh,
    shard_audio_bank,
    shard_psd,
    shard_raw_bank,
    shard_recovery_bank,
)
from sigdigger_tpu.parallel.sharding import (
    make_mesh,
    shard_pipeline,
    sharded_pipeline_step,
)

__all__ = ["make_mesh", "shard_pipeline", "sharded_pipeline_step",
           "distributed", "make_ch_mesh", "shard_audio_bank",
           "shard_psd", "shard_raw_bank", "shard_recovery_bank"]
