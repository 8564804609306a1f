"""Distributed relational operators: shuffle join/groupby, broadcast join,
skew-aware repartitioning.

No counterpart exists in the reference (single-GPU; SURVEY.md §2.8) — this
is the layer `gdf_hash_partition` (libgdf/src/hashing.cu:559-654) was
designed to feed. Design:

  - **ShardedTable**: a global table as (row-sharded columns, per-shard
    live counts). The capacity+count pattern (core/table.py) extends
    naturally across the mesh: every shard owns a fixed-capacity slab plus
    a live count — shapes stay static under pjit while real sizes flow as
    data.
  - **map_shards**: run any shard-local Table→Table function under
    shard_map. The single-chip operators (ops/*) are pure functions of
    Table pytrees, so the SAME code runs single-chip and multi-chip.
  - **shuffle join / groupby**: hash-shuffle on keys (parallel/shuffle.py;
    bit-exact Murmur3 ⇒ same placement as a libgdf-based system), then the
    local operator. Groupby pre-aggregates before shuffling (combiner).
  - **broadcast join**: all_gather a small build side instead of shuffling
    the probe side (distributed analogue of build-on-smaller,
    joining.h:57-70).
  - **skew**: psum'd key histograms detect hot keys (BASELINE config 5).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.column import Column
from ..core.dtypes import DtypeInfo, GDFDtype
from ..core.errors import GDFStatus, require
from ..core.table import Table, table_concat
from ..ops.groupby import groupby as _local_groupby
from ..ops.join import join as _local_join
from .mesh import DEFAULT_AXIS
from .shuffle import all_gather_table, global_partition_histogram, shuffle_shard


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShardedTable:
    """A mesh-global table: `table` holds row-sharded columns with
    num_rows=None (the static slab); `counts` holds each shard's live row
    count (int32[num_shards], sharded one-per-device)."""

    table: Table
    counts: jax.Array

    @property
    def capacity(self) -> int:
        return self.table.capacity

    def total_rows(self):
        return jnp.sum(self.counts)


def distribute(table: Table, mesh: Mesh,
               axis_name: str = DEFAULT_AXIS) -> ShardedTable:
    """Shard a fully-live host/global Table row-wise over the mesh (pads
    the row count up to a multiple of the mesh size)."""
    nshards = int(mesh.devices.size)
    n = table.capacity
    require(table.num_rows is None, GDFStatus.GDF_INVALID_API_CALL,
            "distribute() wants a compacted table")
    per = -(-n // nshards)
    pad = per * nshards - n
    if pad:
        cols = []
        for c in table.columns:
            data = jnp.pad(c.data, (0, pad))
            valid = None if c.valid is None else jnp.pad(c.valid, (0, pad))
            cols.append(Column(data=data, valid=valid, info=c.info,
                               name=c.name))
        table = Table(columns=tuple(cols), names=table.names)
    counts = jnp.asarray(
        [per] * (nshards - 1) + [per - pad], jnp.int32)
    from .mesh import row_sharding
    sharding = row_sharding(mesh, axis_name)
    table = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), table)
    counts = jax.device_put(counts, sharding)
    return ShardedTable(table=table, counts=counts)


def collect(st: ShardedTable) -> Table:
    """Host-side: gather all shards into one compacted host Table."""
    counts = np.asarray(st.counts)
    nshards = counts.shape[0]
    per = st.capacity // nshards
    parts = []
    for i in range(nshards):
        sl = slice(i * per, i * per + int(counts[i]))
        cols = []
        for c in st.table.columns:
            data = jnp.asarray(np.asarray(c.data)[sl])
            valid = (None if c.valid is None
                     else jnp.asarray(np.asarray(c.valid)[sl]))
            cols.append(Column(data=data, valid=valid, info=c.info,
                               name=c.name))
        parts.append(Table(columns=tuple(cols), names=st.table.names))
    return table_concat(parts)


def map_shards(mesh: Mesh, fn: Callable[..., Table], *sts: ShardedTable,
               axis_name: str = DEFAULT_AXIS) -> ShardedTable:
    """Run a shard-local Table→Table function over the mesh. `fn` receives
    each shard's local Table (with its live num_rows) and returns a local
    Table (capacity must be uniform across shards — it is, by SPMD)."""
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis_name),) * len(sts), out_specs=P(axis_name))
    def body(*locals_):
        tables = [st.table.with_num_rows(st.counts[0]) for st in locals_]
        out = fn(*tables)
        cnt = out.row_count()
        cnt = jnp.reshape(jnp.asarray(cnt, jnp.int32), (1,))
        return ShardedTable(table=out.with_num_rows(None), counts=cnt)

    return body(*sts)


# ---------------------------------------------------------------------------
# Distributed groupby
# ---------------------------------------------------------------------------

class _AggPlan:
    """Decompose user aggs into a shuffle-safe two-phase (combiner) plan:
    partial aggregation before the shuffle, exact merge after. AVG travels
    as sum+count and is finalized by a divide (the distributed
    generalization of multi_pass_avg, groupby.cuh:308-419)."""

    def __init__(self, aggs):
        self.user = [(a[0], a[1], a[2] if len(a) > 2 else f"{a[1]}_{a[0]}")
                     for a in aggs]
        self.partial = []
        self.merge = []
        self.post_avg = []
        seen = set()

        def add(col, op, name):
            if name not in seen:
                self.partial.append((col, op, name))
                seen.add(name)

        for col, op, out in self.user:
            if op == "avg":
                s, c = f"__s_{col}", f"__c_{col}"
                add(col, "sum", s)
                add(col, "count", c)
                self.merge += [(s, "sum", s), (c, "sum", c)]
                self.post_avg.append((out, s, c))
            elif op in ("count", "count_distinct"):
                tmp = f"__n_{col}"
                add(col, "count", tmp)
                self.merge.append((tmp, "sum", out))
            else:
                tmp = f"__{op}_{col}"
                add(col, op, tmp)
                self.merge.append((tmp, op, out))

    def finalize(self, t: Table) -> Table:
        for out, s, c in self.post_avg:
            scol, ccol = t[s], t[c]
            avg = scol.data.astype(jnp.float64) / jnp.maximum(ccol.data, 1)
            valid = ccol.data > 0
            if scol.valid is not None:
                valid = jnp.logical_and(valid, scol.valid)
            t = t.with_column(Column(data=avg, valid=valid,
                                     info=DtypeInfo(GDFDtype.FLOAT64),
                                     name=out))
        return t.select([n for n in t.names if not n.startswith("__")])


def dist_groupby(mesh: Mesh, st: ShardedTable, key_names: Sequence[str],
                 aggs, slot_capacity: int | None = None,
                 axis_name: str = DEFAULT_AXIS,
                 pre_aggregate: bool = True) -> ShardedTable:
    """Distributed groupby; result stays sharded (each shard owns a
    disjoint set of groups — the shuffle co-locates equal keys)."""
    nshards = int(mesh.devices.size)
    per_shard = st.capacity // nshards
    if slot_capacity is None:
        slot_capacity = _default_slots(per_shard, nshards)
    plan = _AggPlan(aggs)

    def body(t: Table) -> Table:
        if pre_aggregate:
            t = _local_groupby(t, key_names, plan.partial)
        t = shuffle_shard(t, key_names, axis_name, slot_capacity)
        if pre_aggregate:
            out = _local_groupby(t, key_names, plan.merge)
        else:
            out = _local_groupby(t, key_names, plan.partial)
            out = _rename_to_merge(out, plan)
        return plan.finalize(out)

    return map_shards(mesh, body, st, axis_name=axis_name)


def _rename_to_merge(t: Table, plan: _AggPlan) -> Table:
    mapping = {src: dst for (src, _, dst) in plan.merge}
    cols = tuple(c.with_name(mapping.get(n, n))
                 for n, c in zip(t.names, t.columns))
    return Table(columns=cols, num_rows=t.num_rows,
                 names=tuple(mapping.get(n, n) for n in t.names))


# ---------------------------------------------------------------------------
# Distributed joins
# ---------------------------------------------------------------------------

def _default_slots(per_shard: int, nshards: int) -> int:
    # Each shard sends ≈ per_shard/nshards rows per peer on uniform keys;
    # 2x headroom + fixed floor (skew beyond this → salted path).
    return max(64, 2 * per_shard // max(nshards, 1) + 64)


def dist_join(mesh: Mesh, left: ShardedTable, right: ShardedTable,
              left_on, right_on, how: str = "inner",
              out_capacity_per_shard: int | None = None,
              slot_capacity: int | None = None,
              axis_name: str = DEFAULT_AXIS) -> ShardedTable:
    """Distributed shuffle join: both sides shuffled on their keys with the
    SAME hash/partitioner, then joined shard-locally. FULL joins are safe:
    any key's rows live on exactly one shard."""
    nshards = int(mesh.devices.size)
    lps = left.capacity // nshards
    rps = right.capacity // nshards
    if slot_capacity is None:
        slot_capacity = _default_slots(max(lps, rps), nshards)
    if out_capacity_per_shard is None:
        out_capacity_per_shard = 2 * (lps + rps)

    def body(lt: Table, rt: Table) -> Table:
        lt = shuffle_shard(lt, left_on, axis_name, slot_capacity)
        rt = shuffle_shard(rt, right_on, axis_name, slot_capacity)
        return _local_join(lt, rt, left_on, right_on, how=how,
                             out_capacity=out_capacity_per_shard)

    return map_shards(mesh, body, left, right, axis_name=axis_name)


def broadcast_join(mesh: Mesh, left: ShardedTable, right: ShardedTable,
                   left_on, right_on, how: str = "inner",
                   out_capacity_per_shard: int | None = None,
                   axis_name: str = DEFAULT_AXIS) -> ShardedTable:
    """Replicated-build join: all_gather the (small) right side; the big
    probe side never moves. inner/left only (FULL would double-count
    unmatched build rows across shards)."""
    require(how in ("inner", "left"), GDFStatus.GDF_UNSUPPORTED_JOIN_TYPE,
            "broadcast join supports inner/left only")
    nshards = int(mesh.devices.size)
    lps = left.capacity // nshards
    if out_capacity_per_shard is None:
        out_capacity_per_shard = 2 * (lps + right.capacity)

    def body(lt: Table, rt: Table) -> Table:
        rt_full = all_gather_table(rt, axis_name)
        return _local_join(lt, rt_full, left_on, right_on, how=how,
                             out_capacity=out_capacity_per_shard)

    return map_shards(mesh, body, left, right, axis_name=axis_name)


# ---------------------------------------------------------------------------
# Skew detection (BASELINE config 5)
# ---------------------------------------------------------------------------

def detect_skew(mesh: Mesh, st: ShardedTable, key_names,
                axis_name: str = DEFAULT_AXIS,
                num_bins: int | None = None, threshold: float = 4.0):
    """Global key-hash histogram (psum across shards); bins over
    threshold×mean are hot. A planning-time readout, mirroring how the
    reference exposes partition sizes to its host driver
    (hashing.cu:499-503)."""
    nbins = num_bins or int(mesh.devices.size)

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis_name),
             out_specs=P())
    def run(stl: ShardedTable):
        t = stl.table.with_num_rows(stl.counts[0])
        return global_partition_histogram(t, key_names, axis_name, nbins)

    hist = np.asarray(run(st))
    mean = max(float(hist.mean()), 1.0)
    return hist, hist > threshold * mean
