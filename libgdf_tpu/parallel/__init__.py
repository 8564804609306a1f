"""Distributed layer: device mesh, sharded tables, shuffles, distributed
relational operators (SURVEY.md §2.8 — all new capability; the reference
is single-GPU and stops at gdf_hash_partition)."""
from .mesh import (
    DEFAULT_AXIS, init_distributed, make_mesh, row_sharding, shard_table,
)
from .shuffle import (
    all_gather_table, dest_sizes, global_partition_histogram,
    required_slot_capacity, shuffle_shard,
)
from .distributed import (
    ShardedTable, broadcast_join, collect, detect_skew, dist_groupby,
    dist_join, dist_join_salted, distribute, exact_groupby_slot_capacity,
    plan_salted_join, SaltedJoinPlan,
    exact_slot_capacity,
    map_shards,
)

__all__ = [
    "DEFAULT_AXIS", "init_distributed", "make_mesh", "row_sharding",
    "shard_table", "all_gather_table", "dest_sizes",
    "global_partition_histogram", "required_slot_capacity",
    "shuffle_shard", "ShardedTable", "broadcast_join", "collect",
    "detect_skew", "dist_groupby", "dist_join", "dist_join_salted",
    "plan_salted_join", "SaltedJoinPlan",
    "distribute", "exact_groupby_slot_capacity",
    "exact_slot_capacity", "map_shards",
]
