from bundleadjustment_tpu.parallel.sharded_ba import (
    ShardedBAProblem,
    shard_problem,
    sharded_ba_solve,
)

__all__ = ["ShardedBAProblem", "shard_problem", "sharded_ba_solve"]
