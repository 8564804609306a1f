"""Sorting: order-by permutations, key-value radix sorts, segmented sorts.

≅ reference:
  - multi_col_order_by (libgdf/src/sqls_rtti_comp.hpp:299-320): sequence +
    thrust::sort with the LesserRTTI runtime-dispatch comparator (:100-118);
  - gdf_order_by C API (src/sqls_ops.cu:1373-1392);
  - plan-based CUB radix sorts gdf_radixsort_* (src/sorting.cu:9-216) and
    segmented variants (src/segmented_sorting.cu:10-261);
  - gdf_table::sort (src/gdf_table.cuh:1020-1050).

TPU design: the reference's per-element runtime dtype dispatch
(LesserRTTI's switch per comparison) is replaced by **key normalization**:
each key column is transformed once into a radix-comparable unsigned
bit-string (sign-flip for ints, IEEE-754 order-fix for floats, bit-inverse
for descending), then jax.lax.sort runs over multiple key operands in one
fused sort. NULL ordering is an explicit extra key (0/1 flag), giving
nulls-first/last control the reference's sort path lacks entirely (it
rejects masks, sqls_ops.cu:1103-1106). No plan objects: CUB's plan/scratch
dance (sorting.cu:148-216) is a CUDA memory-management artifact — XLA owns
scratch.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.bits import to_unsigned_bits
from ..core.column import Column
from ..core.errors import GDFStatus, require
from ..core.table import Table


def radix_encode(data: jax.Array, ascending: bool = True) -> jax.Array:
    """Monotone map of a numeric column onto unsigned ints: a < b (as the
    source dtype) iff enc(a) < enc(b) (unsigned). Replaces LesserRTTI
    (sqls_rtti_comp.hpp:100-118) with branch-free bit arithmetic."""
    dt = data.dtype
    if jnp.issubdtype(dt, jnp.floating):
        nbits = dt.itemsize * 8
        u = to_unsigned_bits(data)  # TPU-safe, core/bits.py
        sign = jnp.asarray(1, u.dtype) << (nbits - 1)
        # IEEE-754 total order: negative floats reverse, positives offset.
        enc = jnp.where((u & sign) != 0, ~u, u | sign)
    elif jnp.issubdtype(dt, jnp.signedinteger):
        nbits = dt.itemsize * 8
        u = to_unsigned_bits(data)
        enc = u ^ (jnp.asarray(1, u.dtype) << (nbits - 1))
    elif jnp.issubdtype(dt, jnp.unsignedinteger):
        enc = data
    elif dt == jnp.bool_:
        enc = data.astype(jnp.uint8)
    else:
        require(False, GDFStatus.GDF_UNSUPPORTED_DTYPE, str(dt))
    if not ascending:
        enc = ~enc
    return enc


def _null_key(col: Column, nulls_last: bool, live=None) -> jax.Array:
    """Sort key placing NULLs first/last; dead rows always sort last."""
    if col.valid is None:
        flag = jnp.zeros((col.size,), jnp.uint8)
    else:
        null = jnp.logical_not(col.valid)
        flag = jnp.where(null, jnp.uint8(1 if nulls_last else 0),
                         jnp.uint8(0 if nulls_last else 1))
    if live is not None:
        flag = jnp.where(live, flag, jnp.uint8(2))
    return flag


def order_by(table: Table, key_names: Sequence[str],
             ascending=True, nulls_last: bool = True) -> jax.Array:
    """Return the permutation (int32[capacity]) that sorts the table
    lexicographically by the key columns; stable.

    ≅ gdf_order_by → multi_col_order_by (sqls_ops.cu:1373-1392,
    sqls_rtti_comp.hpp:299-320), extended with per-key direction and null
    placement. Dead rows (capacity+count tables) sort to the end."""
    if isinstance(ascending, bool):
        ascending = [ascending] * len(key_names)
    require(len(ascending) == len(key_names),
            GDFStatus.GDF_INVALID_API_CALL,
            "ascending list length mismatch")
    n = table.capacity
    live = None if table.num_rows is None else table.live_mask()
    operands = []
    for name, asc in zip(key_names, ascending):
        col = table.column(name)
        operands.append(_null_key(col, nulls_last, live))
        live = None  # dead-row key needed once only
        operands.append(radix_encode(col.data, asc))
    iota = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort(tuple(operands) + (iota,),
                       num_keys=len(operands), is_stable=True)
    return out[-1]


def sort_table(table: Table, key_names: Sequence[str] | None = None,
               ascending=True, nulls_last: bool = True) -> Table:
    """Gather the table into sorted order (≅ gdf_table::sort,
    gdf_table.cuh:1020-1050)."""
    keys = list(key_names) if key_names else list(table.names)
    perm = order_by(table, keys, ascending, nulls_last)
    return table.gather(perm, num_rows=table.num_rows)


# ---------------------------------------------------------------------------
# CUB-style key/value radix sorts (sorting.cu, segmented_sorting.cu)
# ---------------------------------------------------------------------------

def radixsort(keys: Column, values: Column | None = None,
              descending: bool = False, begin_bit: int = 0,
              end_bit: int | None = None):
    """Sort (key, value) pairs; returns (sorted_keys, sorted_values).

    ≅ gdf_radixsort_* via cub::DeviceRadixSort::SortPairs[Descending]
    (sorting.cu:48-135). `begin_bit`/`end_bit` restrict comparison to a bit
    range of the radix representation, exactly like CUB; the sort is stable
    within equal restricted keys (CUB radix sort is stable)."""
    enc = radix_encode(keys.data, ascending=True)
    nbits = enc.dtype.itemsize * 8
    end_bit = nbits if end_bit is None else end_bit
    if begin_bit > 0 or end_bit < nbits:
        width = end_bit - begin_bit
        mask = (jnp.asarray(1, enc.dtype) << width) - jnp.asarray(1, enc.dtype)
        enc = (enc >> begin_bit) & mask
    if descending:
        enc = ~enc
    operands = [enc, keys.data]
    if values is not None:
        require(values.size == keys.size,
                GDFStatus.GDF_COLUMN_SIZE_MISMATCH)
        operands.append(values.data)
    out = jax.lax.sort(tuple(operands), num_keys=1, is_stable=True)
    sorted_keys = keys.with_data(out[1])
    sorted_vals = None if values is None else values.with_data(out[2])
    return sorted_keys, sorted_vals


def segment_ids_from_offsets(offsets: jax.Array, n: int) -> jax.Array:
    """Row → segment id from begin-offset array (searchsorted — no scan
    kernels needed)."""
    iota = jnp.arange(n, dtype=offsets.dtype)
    return (jnp.searchsorted(offsets, iota, side="right") - 1).astype(
        jnp.int32)


def segmented_radixsort(keys: Column, values: Column | None,
                        segment_offsets: jax.Array,
                        descending: bool = False, begin_bit: int = 0,
                        end_bit: int | None = None):
    """Per-segment key/value sort; segments given by begin offsets
    (first offset must be 0).

    ≅ gdf_segmented_radixsort_* via cub::DeviceSegmentedRadixSort
    (segmented_sorting.cu:51-160). Implemented as ONE flat sort with the
    segment id as the leading key — the canonical TPU formulation (a
    per-segment loop would defeat XLA's single fused sort)."""
    n = keys.size
    seg = segment_ids_from_offsets(jnp.asarray(segment_offsets, jnp.int32), n)
    enc = radix_encode(keys.data, ascending=True)
    nbits = enc.dtype.itemsize * 8
    end_bit = nbits if end_bit is None else end_bit
    if begin_bit > 0 or end_bit < nbits:
        width = end_bit - begin_bit
        mask = (jnp.asarray(1, enc.dtype) << width) - jnp.asarray(1, enc.dtype)
        enc = (enc >> begin_bit) & mask
    if descending:
        enc = ~enc
    operands = [seg, enc, keys.data]
    if values is not None:
        operands.append(values.data)
    out = jax.lax.sort(tuple(operands), num_keys=2, is_stable=True)
    sorted_keys = keys.with_data(out[2])
    sorted_vals = None if values is None else values.with_data(out[3])
    return sorted_keys, sorted_vals
