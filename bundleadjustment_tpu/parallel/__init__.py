from bundleadjustment_tpu.parallel.frontend import detect_batch_sharded
from bundleadjustment_tpu.parallel.sharded_ba import (
    ShardedBAProblem,
    shard_problem,
    sharded_ba_solve,
)

__all__ = [
    "ShardedBAProblem",
    "detect_batch_sharded",
    "shard_problem",
    "sharded_ba_solve",
]
