"""Stream compaction: filter rows by a stencil, keeping survivors dense.

≅ libgdf/src/streamcompactionops.cu:
  - gpu_apply_stencil (:163-260): thrust::copy_if keeping rows where
    stencil != 0 AND the stencil's own validity bit is set;
  - gpu_concat (:389-503): concatenation incl. bit-level mask stitching.

TPU design: no atomics, no copy_if. Kept rows sort to the front (stable)
with ONE fused multi-payload sort on a 1-byte key (`drop_flag`): every
column's data and validity ride through the sort as payload operands —
measured 4-10x cheaper than sorting indices and gathering (see
ops/engine.py cost model). The survivor count is a fused popcount. Output
keeps the static capacity; `num_rows` carries the live count
(capacity+count pattern — see core/table.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.column import Column
from ..core.errors import GDFStatus, require
from ..core.table import Table
from . import engine
from .engine import multi_sort


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


def compact_table(table: Table, keep: jax.Array):
    """Move rows where `keep` to the front (stable). Returns (Table with
    original capacity, count). TPU: Pallas routing kernel
    (ops/pallas/compact.py); fallback: ONE fused payload sort."""
    arrays, layout = [], []
    for c in table.columns:
        arrays.append(c.data)
        if c.valid is not None:
            arrays.append(c.valid)
            layout.append(2)
        else:
            layout.append(1)
    res, count = compact_arrays(arrays, keep)
    cols, i = [], 0
    for c, w in zip(table.columns, layout):
        data = res[i]
        valid = res[i + 1] if w == 2 else None
        i += w
        cols.append(Column(data=data, valid=valid, info=c.info, name=c.name))
    return Table(columns=tuple(cols), names=table.names), count


# Above this row count the v1 Pallas routing kernel's compile+runtime
# scale super-linearly with the grid (measured v5e: 59 us/block at 1M rows
# but 1.2 ms/block + 1022 s compile at 11M) — v1 falls back to the fused
# payload sort past it. The v2 kernel (pallas/compact2.py: offset-
# prefetched block pipeline) has no such cliff and is the default.
# Override via engine.configure(pallas_compact_max_rows=...).
PALLAS_COMPACT_MAX_ROWS = 2_097_152


def compact_arrays(arrays, keep: jax.Array):
    """Stable stream compaction of raw arrays: returns (compacted arrays,
    count). Backend-selected (engine.configure): Pallas kernel on TPU
    (~100x the sort path), fused 1-key payload sort elsewhere.

    auto (default): v1 routing kernel within its measured sweet spot
    (7.4 vs 5.2 Grows/s end-to-end at 1M — no merge stage), v2
    offset-prefetched kernel above it (flat per-block cost; v1 goes
    super-linear past ~2M rows)."""
    arrays = list(arrays)
    if engine.use_pallas() or engine.pallas_interpret():
        from .pallas import compact_pallas, compact_pallas_supported
        from .pallas.compact2 import compact_pallas2
        if compact_pallas_supported(arrays):
            backend = engine.compact_backend()
            small = keep.shape[0] <= engine.pallas_compact_max_rows()
            if backend == "v2" or (backend == "auto" and not small):
                return compact_pallas2(arrays, keep,
                                       interpret=engine.pallas_interpret())
            if small:
                return compact_pallas(arrays, keep,
                                      interpret=engine.pallas_interpret())
    drop = jnp.logical_not(keep).astype(jnp.uint8)
    res = multi_sort([drop] + arrays, num_keys=1)
    return list(res[1:]), jnp.sum(keep, dtype=jnp.int32)


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
    if col.valid is not None:
        arrays, count = compact_arrays([col.data, col.valid], keep)
        return col.with_data(arrays[0]).with_valid(arrays[1]), count
    arrays, count = compact_arrays([col.data], keep)
    return col.with_data(arrays[0]).with_valid(None), count


def filter_table(table: Table, stencil: Column) -> Table:
    """Compact every column of a table by one stencil; one sort total.
    Returns a Table with num_rows = survivor count."""
    from ..utils.metrics import op_metrics, table_bytes
    require(table.capacity == stencil.size,
            GDFStatus.GDF_COLUMN_SIZE_MISMATCH)
    with op_metrics("LIBGDF_FILTER", rows_in=table.capacity,
                    bytes_est=2 * table_bytes(table)) as m:
        keep = stencil_keep_mask(stencil)
        if table.num_rows is not None:
            keep = jnp.logical_and(keep, table.live_mask())
        out, count = compact_table(table, keep)
        m["rows_out"] = count
    return out.with_num_rows(count)
