"""Device-resident tables (the engine's RecordBatch equivalent).

A Table is an ordered set of equally-sized padded Columns plus a live-row
count.  It replaces the reference's streamed Arrow RecordBatches
(/root/reference/datafusion/src/physical_plan/mod.rs:141-197): instead of
many small batches pulled through async streams, a table is ONE set of large
HBM buffers transformed whole by jitted XLA programs — the shape XLA tiles
best on TPU.

Padding: capacity is rounded up (powers of two ≥ 128) so repeated queries
over similarly-sized data reuse compiled programs.  Rows in [nrows, capacity)
are dead; kernels mask them with ``arange(capacity) < nrows`` where nrows is
passed as a *traced* scalar so changing row counts do not recompile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import jax.numpy as jnp

from ..errors import InternalError
from ..types import Field, Schema
from ..types.dtypes import DataType
from .column import Column
from .dictionary import StringDict

# D2H row-count sync counter (diagnostic): each lazy device count forced to a
# host int costs one blocking round trip (~28 ms through the TPU tunnel).
# bench/profile_q.py reports per-query totals from this.
HOST_SYNCS = [0]


def round_capacity(n: int) -> int:
    """Static buffer capacity for n rows: power of two, min 4096.

    The floor is deliberately high: every distinct capacity is a distinct
    XLA program shape, and compile count dominates small-data latency, so
    small tables all share one bucket."""
    if n <= 4096:
        return 4096
    return 1 << (n - 1).bit_length()


class Table:
    def __init__(self, names: list[str], columns: list[Column], nrows):
        if len(names) != len(columns):
            raise InternalError("names/columns length mismatch")
        caps = {c.capacity for c in columns}
        if len(caps) > 1:
            raise InternalError(f"ragged column capacities: {caps}")
        self.names = list(names)
        self.columns = list(columns)
        # nrows may be a device scalar: it stays on-device until some host
        # decision actually needs the count (the D2H sync costs ~28 ms of
        # fixed latency per program on TPU, so operators that do not need
        # the count — join outputs sized by the candidate total — pass the
        # device value through and let it materialize lazily)
        self._nrows = int(nrows) if isinstance(nrows, (int, np.integer)) else nrows

    @property
    def nrows(self) -> int:
        if not isinstance(self._nrows, int):
            HOST_SYNCS[0] += 1
            self._nrows = int(self._nrows)
        return self._nrows

    @property
    def nrows_dev(self):
        """The live-row count as a jit-traceable scalar (no host sync)."""
        if isinstance(self._nrows, int):
            return np.int64(self._nrows)
        return self._nrows

    # ---- shape -------------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.columns[0].capacity if self.columns else round_capacity(self.nrows)

    @property
    def num_columns(self) -> int:
        return len(self.columns)

    def schema(self) -> Schema:
        return Schema(
            [Field(n, c.dtype, True) for n, c in zip(self.names, self.columns)]
        )

    def column(self, name: str) -> Column:
        return self.columns[self.names.index(name)]

    # ---- construction --------------------------------------------------------
    @staticmethod
    def from_pydict(data: dict, dtypes: dict[str, DataType] | None = None) -> "Table":
        """Build from {name: list/np.ndarray}; infers types via pandas."""
        names, cols = [], []
        nrows = None
        for name, values in data.items():
            col, n = _ingest_values(values, dtypes.get(name) if dtypes else None)
            if nrows is None:
                nrows = n
            elif nrows != n:
                raise InternalError("ragged input columns")
            names.append(name)
            cols.append(col)
        nrows = nrows or 0
        cap = round_capacity(nrows)
        cols = [c.with_capacity(cap) for c in cols]
        return Table(names, cols, nrows)

    @staticmethod
    def from_pandas(df: pd.DataFrame, dtypes: dict[str, DataType] | None = None) -> "Table":
        return Table.from_pydict(
            {c: df[c].to_numpy() for c in df.columns}, dtypes=dtypes
        )

    @staticmethod
    def from_arrow(batch) -> "Table":
        """Ingest a pyarrow Table/RecordBatch."""
        from .ingest import arrow_to_table

        return arrow_to_table(batch)

    @staticmethod
    def empty(schema: Schema) -> "Table":
        cap = round_capacity(0)
        cols = []
        for f in schema.fields:
            d = StringDict.empty() if f.dtype.is_string else None
            cols.append(
                Column(
                    f.dtype,
                    jnp.zeros(cap, f.dtype.storage_np_dtype()),
                    jnp.zeros(cap, bool),
                    d,
                )
            )
        return Table(schema.names(), cols, 0)

    # ---- export ----------------------------------------------------------------
    def to_pydict(self) -> dict[str, list]:
        return {
            n: c.to_pylist(self.nrows) for n, c in zip(self.names, self.columns)
        }

    def to_pandas(self) -> pd.DataFrame:
        return pd.DataFrame(self.to_pydict())

    def to_arrow(self):
        from .ingest import table_to_arrow

        return table_to_arrow(self)

    # ---- manipulation -------------------------------------------------------
    def shrink_to_fit(self, only_if_above: int = 0) -> "Table":
        """Right-size capacity to the live row count (live rows are
        front-compacted, so this is a slice).

        Operators compute over CAPACITY, not live rows, and speculative
        join outputs keep the probe side's capacity — a 42-row HAVING
        result can arrive with a 1M-row buffer and drag every downstream
        sort/aggregate to 25,000x its useful work.  Reading the count
        costs one tiny D2H sync when it is still lazy (~28 ms through a
        remote-TPU tunnel), so callers gate with ``only_if_above``: below
        that capacity the padding is cheaper than the sync.  No-op unless
        the capacity at least halves.

        Tables marked ``_cap_learned`` were already speculatively
        right-sized by their producer (join/stage learned capacities, with
        overflow flags feeding the speculation window), so re-checking
        would pay the sync to learn nothing."""
        if self.capacity <= only_if_above:
            return self
        if getattr(self, "_cap_learned", False) and not isinstance(self._nrows, int):
            return self
        # memoized: a table reused across executions (a morsel-streamed
        # join's HBM-resident build side) must not re-slice its buffers
        # per call — and downstream per-object caches (_join_prep) need a
        # stable result object
        memo = getattr(self, "_shrink_memo", None)
        if memo is not None and memo[0] == only_if_above:
            return memo[1]
        newcap = round_capacity(self.nrows)  # may sync a lazy count
        if newcap * 2 > self.capacity:
            res = self
        else:
            res = self.with_capacity(newcap)
            if getattr(self, "_reused_build", False):
                res._reused_build = True
        self._shrink_memo = (only_if_above, res)
        return res

    def with_capacity(self, capacity: int) -> "Table":
        return Table(
            self.names,
            [c.with_capacity(capacity) for c in self.columns],
            self.nrows_dev,
        )

    def select(self, names: list[str]) -> "Table":
        cols = [self.column(n) for n in names]
        return Table(list(names), cols, self.nrows_dev)

    def __repr__(self) -> str:
        return (
            f"Table[{self.nrows} rows (cap {self.capacity}), "
            + ", ".join(
                f"{n}:{c.dtype!r}" for n, c in zip(self.names, self.columns)
            )
            + "]"
        )


def _ingest_values(values, dtype: DataType | None) -> tuple[Column, int]:
    """Convert one host column (list / np array) into a device Column."""
    from ..types.dtypes import (
        BOOL,
        DATE32,
        FLOAT64,
        INT64,
        STRING,
        TIMESTAMP_US,
    )

    arr = np.asarray(values)
    n = len(arr)

    if dtype is not None and dtype.is_string:
        d, codes, valid = StringDict.from_strings_masked(values)
        return Column.from_numpy(dtype, codes, valid, d), n

    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        items = list(values)
        if all(isinstance(v, str) or v is None for v in items):
            d, codes, valid = StringDict.from_strings_masked(items)
            return Column.from_numpy(STRING, codes, valid, d), n
        # object column of numbers with Nones
        valid = np.array([v is not None and v == v for v in items], dtype=bool)
        nums = np.array([v if ok else 0 for v, ok in zip(items, valid)], dtype=np.float64)
        dt = dtype or (
            INT64 if all(isinstance(v, (int, np.integer)) for v, ok in zip(items, valid) if ok) else FLOAT64
        )
        if dt.is_decimal:
            scaled = np.round(nums * 10**dt.scale).astype(np.int64)
            return Column.from_numpy(dt, np.where(valid, scaled, 0), valid), n
        return Column.from_numpy(dt, nums, valid), n

    if np.issubdtype(arr.dtype, np.datetime64):
        us = arr.astype("datetime64[us]").astype(np.int64)
        valid = ~np.isnat(arr)
        dt = dtype or TIMESTAMP_US
        if dt == DATE32:
            us = arr.astype("datetime64[D]").astype(np.int64)
        return Column.from_numpy(dt, np.where(valid, us, 0), valid), n

    if arr.dtype == np.bool_:
        return Column.from_numpy(dtype or BOOL, arr), n

    if np.issubdtype(arr.dtype, np.floating):
        valid = ~np.isnan(arr)
        dt = dtype or (FLOAT64 if arr.dtype == np.float64 else DataType("float32"))
        if dt.is_decimal:
            scaled = np.round(np.where(valid, arr, 0) * 10 ** dt.scale).astype(np.int64)
            return Column.from_numpy(dt, scaled, valid), n
        if dt.is_integer:
            return Column.from_numpy(dt, np.where(valid, arr, 0), valid), n
        return Column.from_numpy(dt, np.where(valid, arr, 0.0), valid), n

    if np.issubdtype(arr.dtype, np.integer):
        dt = dtype or DataType(str(arr.dtype))
        if dt.is_decimal:
            scaled = arr.astype(np.int64) * 10 ** dt.scale
            return Column.from_numpy(dt, scaled), n
        return Column.from_numpy(dt, arr), n

    raise InternalError(f"cannot ingest column of dtype {arr.dtype}")
