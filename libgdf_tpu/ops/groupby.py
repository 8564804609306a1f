"""Groupby / aggregate: sum, min, max, avg, count, count-distinct.

≅ reference:
  - hash path: gdf_group_by_hash → GroupbyHash (libgdf/src/groupby/
    groupby.cuh:208-250, hash/groupby_compute_api.h:143-225): a
    concurrent_unordered_map keyed by row index, CAS-aggregating in place
    (hash/groupby_kernels.cuh:42-108), extraction via a global atomic write
    index (:125-160); AVG = COUNT pass + SUM pass + divide
    (groupby.cuh:308-419 multi_pass_avg);
  - sort path: multi_col_group_by_*_sort = sort + thrust::reduce_by_key
    (src/sqls_rtti_comp.hpp:400-660), C API gdf_group_by_{sum,min,max,avg,
    count} (src/sqls_ops.cu:1426-1487);
  - COUNT DISTINCT collapses to a scalar (sqls_rtti_comp.hpp:400-441).

TPU design: the CAS-aggregation hash map has no TPU analogue (no global
atomics), and the sort path is the naturally vector-friendly formulation —
so there is ONE implementation, sort-based:

    encode keys → one stable multi-key sort → group boundaries =
    adjacent-difference → segment ids = prefix sum → jax.ops.segment_sum/
    min/max (XLA's fused segmented reductions) → group representatives via
    one compaction.

  The hash path's contention regimes (AllKeysSame / WarpKeysSame gtest
  stress patterns, tests/groupby/groupby-test.cu:369-441) are non-issues
  here: a segment reduction's cost is independent of key skew.

  Output is sorted by key for free (the reference offers this as the
  optional flag_sort_result post-pass, groupby_compute_api.h:211-222).

Null semantics (the reference has NONE — its sort path rejects masks,
sqls_ops.cu:1103-1106, and its hash path ignores them): pandas-compatible
and strictly more capable — `dropna=True` drops null-key rows; aggregates
skip null values; COUNT counts non-null values of the agg column.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.column import Column
from ..core.dtypes import DtypeInfo, GDFDtype
from ..core.errors import GDFStatus, require
from ..core.table import Table
from .compaction import compaction_indices
from .join import mask_or
from .sort import radix_encode

AGG_OPS = ("sum", "min", "max", "avg", "count", "count_distinct")


def _agg_identity(op: str, dtype):
    if op == "sum":
        return jnp.zeros((), dtype)
    if op == "min":
        return jnp.asarray(jnp.inf if jnp.issubdtype(dtype, jnp.floating)
                           else np.iinfo(np.dtype(dtype)).max, dtype)
    if op == "max":
        return jnp.asarray(-jnp.inf if jnp.issubdtype(dtype, jnp.floating)
                           else np.iinfo(np.dtype(dtype)).min, dtype)
    raise ValueError(op)


def groupby(table: Table, key_names: Sequence[str],
            aggs: Sequence[tuple], dropna: bool = True) -> Table:
    """Group by key columns, apply aggregations.

    aggs: sequence of (column_name, op[, output_name]) with op in AGG_OPS.
    Returns a Table of key columns + one column per agg, padded to the
    input capacity with num_rows = number of groups, sorted by key.

    ≅ gdf_group_by_{sum,min,max,avg,count} (sqls_ops.cu:1426-1487) — both
    the GDF_HASH and GDF_SORT methods map to this one implementation."""
    require(len(key_names) > 0, GDFStatus.GDF_DATASET_EMPTY, "no keys")
    for a in aggs:
        require(a[1] in AGG_OPS, GDFStatus.GDF_INVALID_AGGREGATOR, a[1])

    n = table.capacity
    key_cols = [table.column(k) for k in key_names]

    # --- sort rows by keys (null/dead rows to the end) ---
    drop = None
    for c in key_cols:
        if c.valid is not None:
            drop = mask_or(drop, jnp.logical_not(c.valid))
    if not dropna and drop is not None:
        # Keep null-key rows: each becomes its own group, NULL != NULL —
        # the semantics gdf_table::rows_equal would imply
        # (gdf_table.cuh:588-591).
        null_rows = drop
        drop = None
    else:
        null_rows = None
    if table.num_rows is not None:
        drop = mask_or(drop, jnp.logical_not(table.live_mask()))
    dropped = (jnp.zeros((n,), jnp.uint8) if drop is None
               else drop.astype(jnp.uint8))

    enc_keys = []
    for c in key_cols:
        data = c.data
        if jnp.issubdtype(data.dtype, jnp.floating):
            data = jnp.where(data == 0, jnp.zeros_like(data), data)
        enc_keys.append(radix_encode(data, ascending=True))
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(tuple([dropped] + enc_keys + [iota]),
                              num_keys=1 + len(enc_keys), is_stable=True)
    s_dropped = sorted_ops[0].astype(jnp.bool_)
    s_keys = list(sorted_ops[1:-1])
    perm = sorted_ops[-1]

    # --- group boundaries (≅ reduce_by_key's equality predicate) ---
    new_group = jnp.zeros((n,), jnp.bool_).at[0].set(True)
    for k in s_keys:
        new_group = jnp.logical_or(new_group, k != jnp.roll(k, 1))
    if null_rows is not None:
        s_null = jnp.take(null_rows, perm)
        # a null-key row always starts (and ends) its own group
        new_group = jnp.logical_or(new_group, s_null)
        new_group = jnp.logical_or(new_group,
                                   jnp.roll(s_null, 1).at[0].set(False))
    new_group = jnp.logical_and(new_group, jnp.logical_not(s_dropped))

    seg = jnp.cumsum(new_group, dtype=jnp.int32) - 1           # [-1..G-1]
    # dropped rows → segment n (out of range of every output)
    seg = jnp.where(s_dropped, n, jnp.maximum(seg, 0))
    num_groups = jnp.sum(new_group, dtype=jnp.int32)

    # --- group representative rows → output key columns ---
    starts, _ = compaction_indices(new_group)
    rep = jnp.take(perm, starts)   # original row index of each group head
    out_cols = [
        _gather_out(c, rep).with_name(name)
        for name, c in zip(key_names, key_cols)
    ]

    # --- aggregations: one segment reduction per agg ---
    group_live = jnp.arange(n, dtype=jnp.int32) < num_groups
    for spec in aggs:
        col_name, op = spec[0], spec[1]
        out_name = spec[2] if len(spec) > 2 else f"{op}_{col_name}"
        acol = table.column(col_name)
        vals = jnp.take(acol.data, perm)
        avalid = (None if acol.valid is None
                  else jnp.take(acol.valid, perm))
        out_cols.append(_segment_agg(
            vals, avalid, seg, n, op, group_live).with_name(out_name))

    out = Table.from_columns(out_cols, num_rows=num_groups)
    return out


def _gather_out(c: Column, rep) -> Column:
    data = jnp.take(c.data, rep)
    valid = None if c.valid is None else jnp.take(c.valid, rep)
    return Column(data=data, valid=valid, info=c.info, name=c.name)


def _segment_agg(vals, avalid, seg, num_segments, op, group_live) -> Column:
    """One fused segmented reduction (≅ build_aggregation_table's CAS loop,
    groupby_kernels.cuh:42-108, minus the atomics)."""
    from ..core.dtypes import dtype_from_numpy

    if op in ("count", "count_distinct"):
        ones = (jnp.ones(vals.shape, jnp.int32) if avalid is None
                else avalid.astype(jnp.int32))
        out = jax.ops.segment_sum(ones, seg, num_segments=num_segments + 1,
                                    indices_are_sorted=True)
        return Column(data=out[:num_segments].astype(jnp.int64),
                      valid=group_live, info=DtypeInfo(GDFDtype.INT64))

    if op == "avg":
        # ≅ multi_pass_avg (groupby.cuh:308-419): sum + count, divide.
        fvals = vals.astype(jnp.float64)
        if avalid is not None:
            fvals = jnp.where(avalid, fvals, 0.0)
            cnt = jax.ops.segment_sum(avalid.astype(jnp.int32), seg,
                                      num_segments=num_segments + 1,
                                      indices_are_sorted=True)
        else:
            cnt = jax.ops.segment_sum(jnp.ones(vals.shape, jnp.int32), seg,
                                      num_segments=num_segments + 1,
                                      indices_are_sorted=True)
        tot = jax.ops.segment_sum(fvals, seg, num_segments=num_segments + 1,
                                  indices_are_sorted=True)
        cnt = cnt[:num_segments]
        avg = tot[:num_segments] / jnp.maximum(cnt, 1)
        valid = jnp.logical_and(group_live, cnt > 0)
        return Column(data=avg, valid=valid,
                      info=DtypeInfo(GDFDtype.FLOAT64))

    ident = _agg_identity(op, vals.dtype)
    if avalid is not None:
        vals = jnp.where(avalid, vals, ident)
    if op == "sum":
        out = jax.ops.segment_sum(vals, seg, num_segments=num_segments + 1,
                                  indices_are_sorted=True)
    elif op == "min":
        out = jax.ops.segment_min(vals, seg, num_segments=num_segments + 1,
                                  indices_are_sorted=True)
    else:
        out = jax.ops.segment_max(vals, seg, num_segments=num_segments + 1,
                                  indices_are_sorted=True)
    out = out[:num_segments]
    if avalid is not None:
        nvalid = jax.ops.segment_sum(avalid.astype(jnp.int32), seg,
                                     num_segments=num_segments + 1,
                                     indices_are_sorted=True)
        valid = jnp.logical_and(group_live, nvalid[:num_segments] > 0)
    else:
        valid = group_live
    return Column(data=out, valid=valid,
                  info=DtypeInfo(dtype_from_numpy(np.dtype(out.dtype))))


def count_distinct_keys(table: Table, key_names: Sequence[str],
                        dropna: bool = True):
    """Scalar number of distinct key tuples.

    ≅ GDF_COUNT_DISTINCT collapsing to a single value
    (sqls_rtti_comp.hpp:400-441 DISTINCT branch)."""
    g = groupby(table, key_names,
                aggs=[(key_names[0], "count", "_c")], dropna=dropna)
    return g.num_rows


# Convenience wrappers matching the reference C API names
def group_by_sum(table, keys, agg_col):
    """≅ gdf_group_by_sum (sqls_ops.cu:1426-1436)."""
    return groupby(table, keys, [(agg_col, "sum", "out")])


def group_by_min(table, keys, agg_col):
    return groupby(table, keys, [(agg_col, "min", "out")])


def group_by_max(table, keys, agg_col):
    return groupby(table, keys, [(agg_col, "max", "out")])


def group_by_avg(table, keys, agg_col):
    return groupby(table, keys, [(agg_col, "avg", "out")])


def group_by_count(table, keys):
    return groupby(table, keys, [(keys[0], "count", "out")])
