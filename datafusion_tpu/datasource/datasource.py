"""TableProvider: the data-source contract.

Equivalent of /root/reference/datafusion/src/datasource/datasource.rs:81
(TableProvider trait: schema(), scan(projection, batch_size, filters, limit),
supports_filter_pushdown, statistics) and memory.rs:45 (MemTable).

TPU-native: scan() returns an ExecutionPlan whose execute() yields ONE
device-resident Table.  File providers ingest via pyarrow on the host once
and keep the ingested columns cached in HBM; projection pushdown selects
which columns are transferred.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..columnar.table import Table
from ..errors import PlanError
from ..ops.base import ExecutionPlan
from ..ops.basic import MemoryExec
from ..types import Schema


@dataclass
class ColumnStatistics:
    """Per-column stats (reference physical_plan ColumnStatistics)."""

    null_count: int | None = None
    min_value: object = None  # in storage semantics (date32 days, scaled dec)
    max_value: object = None
    distinct_count: int | None = None


@dataclass
class Statistics:
    """Reference physical_plan Statistics: row count, sizes, per-column."""

    num_rows: int | None = None
    total_byte_size: int | None = None
    is_exact: bool = False
    column_statistics: dict | None = None  # name -> ColumnStatistics


class TableProvider:
    def schema(self) -> Schema:
        raise NotImplementedError

    def scan(
        self,
        projection: list[int] | None = None,
        filters: list | None = None,
        limit: int | None = None,
        table_name: str = "",
    ) -> ExecutionPlan:
        raise NotImplementedError

    def statistics(self) -> Statistics:
        return Statistics()

    def supports_filter_pushdown(self, expr) -> str:
        """'unsupported' | 'inexact' | 'exact'
        (datasource.rs:90-101 TableProviderFilterPushDown)."""
        return "unsupported"


class MemTable(TableProvider):
    """In-memory (HBM-resident) table (reference memory.rs:45)."""

    def __init__(self, table: Table):
        self.table = table
        self._schema = table.schema()

    @staticmethod
    def from_pydict(data, dtypes=None) -> "MemTable":
        return MemTable(Table.from_pydict(data, dtypes))

    def schema(self) -> Schema:
        return self._schema

    def statistics(self) -> Statistics:
        return Statistics(num_rows=self.table.nrows, is_exact=True)

    def scan(self, projection=None, filters=None, limit=None, table_name="") -> ExecutionPlan:
        return MemoryExec(self.table, self._schema, projection, table_name=table_name)
