"""Table: an ordered set of equal-length Columns, as a JAX pytree.

≅ reference `gdf_table` (libgdf/src/gdf_table.cuh:241-1363), re-designed
for XLA:

  - the reference's device arrays-of-pointers + runtime dtype switches
    become a static pytree: every op is traced per table schema, so column
    loops unroll at trace time and XLA fuses across columns;
  - `hash_row` / `rows_equal` (gdf_table.cuh:704-854, 580-691) become
    whole-column vectorized kernels (ops/hashing.py, rows_equal here);
  - multi-stream per-column gather/scatter (gdf_table.cuh:874-1010,
    1071-1192) becomes per-column jnp.take / scatter — XLA schedules the
    independent column ops concurrently without explicit streams;
  - **capacity + count**: ops with data-dependent output sizes (filter,
    join, groupby) return a Table padded to a static capacity plus a traced
    `num_rows` scalar. Rows past `num_rows` are dead. This replaces the
    reference's estimate-and-retry allocation loop
    (join_compute_api.h:443-505) with shapes XLA can compile once.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .bitmask import mask_and
from .column import Column
from .errors import GDFStatus, require


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Table:
    columns: tuple  # tuple[Column, ...]
    # Traced number of live rows; None ⇒ all `capacity` rows are live.
    num_rows: Optional[jax.Array] = None
    names: tuple = field(default=(), metadata=dict(static=True))

    # -- construction --------------------------------------------------------

    @staticmethod
    def from_columns(columns: Sequence[Column], num_rows=None) -> "Table":
        columns = tuple(columns)
        require(len(columns) > 0, GDFStatus.GDF_DATASET_EMPTY,
                "table with zero columns")
        n = columns[0].size
        for c in columns:
            require(c.size == n, GDFStatus.GDF_COLUMN_SIZE_MISMATCH,
                    f"column {c.name!r} has {c.size} rows, expected {n}")
        names = []
        for i, c in enumerate(columns):
            names.append(c.name if c.name else f"c{i}")
        if num_rows is not None and not isinstance(num_rows, (int, np.integer)):
            num_rows = jnp.asarray(num_rows, jnp.int32)
        return Table(columns=columns, num_rows=num_rows, names=tuple(names))

    @staticmethod
    def from_dict(data: dict, nulls: dict | None = None) -> "Table":
        """data: {name: array}; nulls: {name: bool null-mask} (True=NULL)."""
        nulls = nulls or {}
        cols = [Column.from_masked(v, nulls.get(k), name=k)
                for k, v in data.items()]
        return Table.from_columns(cols)

    @staticmethod
    def from_pandas(df) -> "Table":
        cols = []
        for name in df.columns:
            s = df[name]
            null = s.isna().to_numpy()
            vals = s.to_numpy()
            if null.any():
                vals = np.where(null, 0, vals).astype(vals.dtype)
                cols.append(Column.from_masked(vals, null, name=str(name)))
            else:
                cols.append(Column.from_array(vals, name=str(name)))
        return Table.from_columns(cols)

    # -- introspection -------------------------------------------------------

    @property
    def capacity(self) -> int:
        """Static row capacity (array length)."""
        return self.columns[0].size

    @property
    def num_columns(self) -> int:
        return len(self.columns)

    def row_count(self):
        """Live row count: traced scalar, or static capacity."""
        return self.capacity if self.num_rows is None else self.num_rows

    def column(self, name: str) -> Column:
        try:
            return self.columns[self.names.index(name)]
        except ValueError:
            raise KeyError(name) from None

    def __getitem__(self, name: str) -> Column:
        return self.column(name)

    def select(self, names: Sequence[str]) -> "Table":
        cols = tuple(self.column(n) for n in names)
        return replace(self, columns=cols, names=tuple(names))

    def replace_column(self, name: str, col: Column) -> "Table":
        i = self.names.index(name)
        cols = list(self.columns)
        cols[i] = col.with_name(name)
        return replace(self, columns=tuple(cols))

    def with_column(self, col: Column) -> "Table":
        if col.name in self.names:
            return self.replace_column(col.name, col)
        return replace(self, columns=self.columns + (col,),
                       names=self.names + (col.name,))

    def with_num_rows(self, num_rows) -> "Table":
        if num_rows is not None and not isinstance(num_rows, (int, np.integer)):
            num_rows = jnp.asarray(num_rows, jnp.int32)
        return replace(self, num_rows=num_rows)

    # -- row machinery (≅ gdf_table device methods) ---------------------------

    def live_mask(self) -> jax.Array:
        """bool[capacity]: True for rows < num_rows."""
        if self.num_rows is None:
            return jnp.ones((self.capacity,), jnp.bool_)
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.num_rows

    def row_validity(self) -> jax.Array:
        """Row is valid iff valid in EVERY column (and live).

        ≅ gdf_table's precomputed row bitmask: thrust::tabulate over
        row_masker = AND of column masks (gdf_table.cuh:62-98, 310-318)."""
        m = None
        for c in self.columns:
            m = mask_and(m, c.valid)
        live = None if self.num_rows is None else self.live_mask()
        m = mask_and(m, live)
        if m is None:
            return jnp.ones((self.capacity,), jnp.bool_)
        return m

    def rows_equal(self, other: "Table", my_idx, other_idx) -> jax.Array:
        """Vectorized row equality between index vectors into two tables.

        ≅ gdf_table::rows_equal (gdf_table.cuh:580-691): rows containing a
        NULL are never equal to anything (NULL != x for all x)."""
        require(self.num_columns == other.num_columns,
                GDFStatus.GDF_JOIN_DTYPE_MISMATCH, "column count mismatch")
        my_valid = jnp.take(self.row_validity(), my_idx, mode="clip")
        ot_valid = jnp.take(other.row_validity(), other_idx, mode="clip")
        eq = jnp.logical_and(my_valid, ot_valid)
        for a, b in zip(self.columns, other.columns):
            require(a.info.gdf_dtype == b.info.gdf_dtype,
                    GDFStatus.GDF_JOIN_DTYPE_MISMATCH,
                    f"dtype mismatch {a.name}/{b.name}")
            av = jnp.take(a.data, my_idx, mode="clip")
            bv = jnp.take(b.data, other_idx, mode="clip")
            eq = jnp.logical_and(eq, av == bv)
        return eq

    def gather(self, indices, fill_invalid: bool = False,
               num_rows=None) -> "Table":
        """New table = rows at `indices` (per column).

        ≅ gdf_table::gather(range_check) (gdf_table.cuh:874-1010): with
        `fill_invalid`, negative indices (the reference's -1 from outer
        joins, joining.cu:375-479) produce NULL rows instead of garbage."""
        indices = jnp.asarray(indices, jnp.int32)
        in_range = None
        if fill_invalid:
            in_range = jnp.logical_and(indices >= 0,
                                       indices < self.capacity)
        cols = []
        for c in self.columns:
            data = jnp.take(c.data, indices, mode="clip")
            valid = c.valid
            if valid is not None:
                valid = jnp.take(valid, indices, mode="clip")
            valid = mask_and(valid, in_range)
            cols.append(replace(c, data=data, valid=valid))
        return Table(columns=tuple(cols), names=self.names,
                     num_rows=None if num_rows is None
                     else jnp.asarray(num_rows, jnp.int32))

    def scatter(self, locations, out_capacity: int | None = None) -> "Table":
        """New table with row i placed at locations[i].

        ≅ gdf_table::scatter (gdf_table.cuh:1071-1192) incl. the bitmask
        scatter kernel (:113-150) — one XLA scatter per column here."""
        locations = jnp.asarray(locations, jnp.int32)
        cap = out_capacity or self.capacity
        cols = []
        for c in self.columns:
            data = jnp.zeros((cap,), c.data.dtype).at[locations].set(c.data)
            valid = c.valid
            if valid is not None:
                valid = jnp.zeros((cap,), jnp.bool_).at[locations].set(valid)
            cols.append(replace(c, data=data, valid=valid))
        return Table(columns=tuple(cols), names=self.names,
                     num_rows=self.num_rows)

    # -- host-side helpers (sync; for tests/inspection) ------------------------

    def compact(self) -> "Table":
        """Host-sync: slice off dead rows (a real size is materialized)."""
        if self.num_rows is None:
            return self
        n = int(self.num_rows)
        cols = tuple(
            replace(c, data=c.data[:n],
                    valid=None if c.valid is None else c.valid[:n])
            for c in self.columns)
        return Table(columns=cols, names=self.names, num_rows=None)

    def to_pandas(self):
        import pandas as pd
        t = self.compact()
        out = {}
        for name, c in zip(t.names, t.columns):
            vals, nulls = c.to_numpy_masked()
            if nulls.any():
                s = pd.Series(vals)
                s[nulls] = pd.NA
                out[name] = s
            else:
                out[name] = pd.Series(vals)
        return pd.DataFrame(out)


def table_concat(tables: Sequence[Table]) -> Table:
    """Row-wise concatenation (≅ gdf_column_concat applied per column,
    src/column.cpp:53-153). All inputs must be fully live (no num_rows)."""
    from .column import column_concat
    first = tables[0]
    for t in tables:
        require(t.names == first.names, GDFStatus.GDF_DTYPE_MISMATCH,
                "schema mismatch in concat")
        require(t.num_rows is None, GDFStatus.GDF_INVALID_API_CALL,
                "concat of padded tables: compact() first")
    cols = tuple(
        column_concat([t.columns[i] for t in tables])
        for i in range(first.num_columns))
    return Table(columns=cols, names=first.names)
