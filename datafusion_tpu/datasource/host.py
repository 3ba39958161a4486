"""Host-resident tables + morsel streaming: out-of-HBM execution.

The reference never needs a whole table in memory — scans stream batches
from disk on a blocking reader thread
(/root/reference/datafusion/src/physical_plan/parquet.rs:596-636).  The
TPU analogue (SURVEY.md §7 hard part (g)): a table too big for HBM stays
in HOST memory as numpy columns, and fused stages execute per-MORSEL — a
fixed-capacity device slice — with partial-aggregate merging.  Because
every morsel shares one static shape, the whole scan reuses ONE compiled
XLA program, and the next morsel's H2D transfer is issued before the
current morsel's compute is consumed (double-buffered upload).

`HostMemoryExec` subclasses `MemoryExec`, so every non-morsel-aware
consumer (joins, the distributed planner, serde) keeps working by lazily
materializing the full table on device; only the fused-stage path
(physical/morsel.py) streams.
"""

from __future__ import annotations

import numpy as np

from ..columnar.column import Column
from ..columnar.dictionary import StringDict
from ..columnar.table import Schema, Table, round_capacity
from ..errors import InternalError
from ..ops.basic import MemoryExec
from ..types.dtypes import DataType
from .datasource import TableProvider

DEFAULT_MORSEL_ROWS = 1 << 20


class HostTable:
    """Columns as numpy arrays on the host; device transfer happens per
    morsel (or once, for the materialize fallback)."""

    def __init__(
        self,
        names: list[str],
        dtypes: list[DataType],
        datas: list[np.ndarray],
        valids: list[np.ndarray],
        dicts: list[StringDict | None],
        nrows: int,
        morsel_rows: int = DEFAULT_MORSEL_ROWS,
    ):
        self.names = list(names)
        self.dtypes = list(dtypes)
        self.datas = list(datas)
        self.valids = list(valids)
        self.dicts = list(dicts)
        self.nrows = int(nrows)
        self.morsel_rows = int(morsel_rows)
        self._materialized: Table | None = None

    # ---- construction ------------------------------------------------------
    @staticmethod
    def from_table(t: Table, morsel_rows: int = DEFAULT_MORSEL_ROWS) -> "HostTable":
        """Copy a device Table to host (tests / explicit registration)."""
        n = t.nrows
        return HostTable(
            list(t.names),
            [c.dtype for c in t.columns],
            [np.asarray(c.data[:n]) for c in t.columns],
            [np.asarray(c.valid[:n]) for c in t.columns],
            [c.dictionary for c in t.columns],
            n,
            morsel_rows,
        )

    @staticmethod
    def from_pydict(
        data: dict, dtypes=None, morsel_rows: int = DEFAULT_MORSEL_ROWS
    ) -> "HostTable":
        # ingest via the standard path, then keep the host copies
        t = Table.from_pydict(data, dtypes=dtypes)
        return HostTable.from_table(t, morsel_rows)

    @staticmethod
    def from_arrow(t, morsel_rows: int = DEFAULT_MORSEL_ROWS) -> "HostTable":
        """pyarrow Table/RecordBatch -> HostTable with NO device transfer —
        the out-of-HBM ingestion path (whole-file pyarrow read stays in
        host memory; morsels stream to the device on demand)."""
        from ..columnar.ingest import arrow_column_to_numpy

        names = list(t.schema.names)
        dtypes, datas, valids, dicts = [], [], [], []
        for i in range(len(names)):
            dt, data, valid, dic = arrow_column_to_numpy(t.column(i))
            dtypes.append(dt)
            datas.append(data)
            valids.append(valid)
            dicts.append(dic)
        return HostTable(names, dtypes, datas, valids, dicts, t.num_rows, morsel_rows)

    @staticmethod
    def from_parquet(path: str, morsel_rows: int = DEFAULT_MORSEL_ROWS) -> "HostTable":
        import pyarrow.parquet as pq

        return HostTable.from_arrow(pq.read_table(path), morsel_rows)

    # ---- shape -------------------------------------------------------------
    def schema(self) -> Schema:
        from ..columnar.table import Field

        return Schema([Field(n, dt, True) for n, dt in zip(self.names, self.dtypes)])

    def select(self, indices: list[int]) -> "HostTable":
        return HostTable(
            [self.names[i] for i in indices],
            [self.dtypes[i] for i in indices],
            [self.datas[i] for i in indices],
            [self.valids[i] for i in indices],
            [self.dicts[i] for i in indices],
            self.nrows,
            self.morsel_rows,
        )

    @property
    def num_morsels(self) -> int:
        return max(1, -(-self.nrows // self.morsel_rows))

    # ---- device transfer ---------------------------------------------------
    def morsel(self, i: int) -> Table:
        """Device Table for morsel i: rows [i*M, min((i+1)*M, nrows)), padded
        to the static morsel capacity (one shape for the whole scan)."""
        import jax.numpy as jnp

        m = self.morsel_rows
        lo = i * m
        hi = min(lo + m, self.nrows)
        if lo >= self.nrows and i != 0:
            raise InternalError(f"morsel {i} out of range")
        k = hi - lo
        cap = round_capacity(m)
        cols = []
        for dt, d, v, dic in zip(self.dtypes, self.datas, self.valids, self.dicts):
            buf = np.zeros(cap, dtype=d.dtype)
            buf[:k] = d[lo:hi]
            vb = np.zeros(cap, dtype=bool)
            vb[:k] = v[lo:hi]
            # jnp.asarray dispatches the H2D copy asynchronously: callers
            # fetch morsel i+1 before consuming i's outputs (double buffer)
            cols.append(Column(dt, jnp.asarray(buf), jnp.asarray(vb), dic))
        return Table(self.names, cols, k)

    def materialize(self) -> Table:
        """Full device residency — the fallback for consumers that need the
        whole table (joins, distributed shipping).  Cached."""
        if self._materialized is None:
            import jax.numpy as jnp

            cap = round_capacity(self.nrows)
            cols = []
            for dt, d, v, dic in zip(self.dtypes, self.datas, self.valids, self.dicts):
                buf = np.zeros(cap, dtype=d.dtype)
                buf[: self.nrows] = d
                vb = np.zeros(cap, dtype=bool)
                vb[: self.nrows] = v
                cols.append(Column(dt, jnp.asarray(buf), jnp.asarray(vb), dic))
            self._materialized = Table(self.names, cols, self.nrows)
        return self._materialized


class HostMemoryExec(MemoryExec):
    """Scan leaf over a HostTable.  As a MemoryExec subclass it lazily
    materializes for any consumer that reads `.table`; the fused-stage
    optimizer intercepts it first and streams morsels instead
    (physical/morsel.py MorselStageExec)."""

    def __init__(self, host: HostTable, schema: Schema, projection=None, table_name: str = ""):
        # NOTE: do not call super().__init__ with a table — materialization
        # must stay lazy
        from ..ops.base import ExecutionPlan

        ExecutionPlan.__init__(self)
        self.host = host
        self._schema = schema
        self.projection = projection
        self.table_name = table_name

    @property
    def table(self) -> Table:
        return self.host.materialize()

    def projected_host(self) -> HostTable:
        if self.projection is None:
            return self.host
        return self.host.select(self.projection)

    def _display_line(self):
        return (
            f"HostMemoryExec: {self.host.nrows} rows"
            f" ({self.host.num_morsels} morsels x {self.host.morsel_rows})"
        )


class HostTableProvider(TableProvider):
    """Catalog provider for host-resident tables (register_host_table)."""

    def __init__(self, host: HostTable):
        self.host = host

    def schema(self) -> Schema:
        return self.host.schema()

    def statistics(self):
        from .datasource import Statistics

        return Statistics(num_rows=self.host.nrows, is_exact=True)

    def scan(self, projection=None, filters=None, limit=None, table_name=""):
        return HostMemoryExec(self.host, self.host.schema(), projection, table_name)
