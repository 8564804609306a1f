"""Stream compaction: filter rows by a stencil, keeping survivors dense.

≅ libgdf/src/streamcompactionops.cu:
  - gpu_apply_stencil (:163-260): thrust::copy_if keeping rows where
    stencil != 0 AND the stencil's own validity bit is set;
  - gpu_concat (:389-503): concatenation incl. bit-level mask stitching.

TPU design: no atomics, no copy_if. The compaction permutation is computed
with ONE stable sort on a 1-byte key (`drop_flag`) via jax.lax.sort — kept
rows sort to the front in original order; the survivor count is a fused
popcount. XLA's TPU sort is vastly faster than element-scatters (which
serialize on TPU), and the permutation is reused across all columns of a
table. Output keeps the static capacity; `num_rows` carries the live count
(capacity+count pattern — see core/table.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.column import Column
from ..core.errors import GDFStatus, require
from ..core.table import Table


def compaction_indices(keep: jax.Array):
    """Return (src_indices: int32[n] — kept-row indices first, stable;
    count: int32 scalar).

    The j-th output row (j < count) comes from src_indices[j]."""
    n = keep.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    drop = jnp.logical_not(keep).astype(jnp.uint8)
    _, perm = jax.lax.sort((drop, iota), num_keys=1, is_stable=True)
    count = jnp.sum(keep, dtype=jnp.int32)
    return perm, count


def stencil_keep_mask(stencil: Column) -> jax.Array:
    """Rows pass iff stencil value != 0 AND stencil bit valid
    (streamcompactionops.cu:163-260 zip(stencil, valid-bit) predicate)."""
    keep = stencil.data != 0
    if stencil.valid is not None:
        keep = jnp.logical_and(keep, stencil.valid)
    return keep


def apply_stencil(col: Column, stencil: Column):
    """Compact one column by a stencil. Returns (Column, count) with the
    column padded to its original capacity.

    ≅ gdf_apply_stencil (streamcompactionops.cu:163-260)."""
    require(col.size == stencil.size, GDFStatus.GDF_COLUMN_SIZE_MISMATCH)
    keep = stencil_keep_mask(stencil)
    perm, count = compaction_indices(keep)
    data = jnp.take(col.data, perm)
    valid = None if col.valid is None else jnp.take(col.valid, perm)
    return col.with_data(data).with_valid(valid), count


def filter_table(table: Table, stencil: Column) -> Table:
    """Compact every column of a table by one stencil; one sort total.
    Returns a Table with num_rows = survivor count."""
    require(table.capacity == stencil.size,
            GDFStatus.GDF_COLUMN_SIZE_MISMATCH)
    keep = stencil_keep_mask(stencil)
    if table.num_rows is not None:
        keep = jnp.logical_and(keep, table.live_mask())
    perm, count = compaction_indices(keep)
    out = table.gather(perm)
    return out.with_num_rows(count)
