"""File-based table providers: CSV, Parquet, NDJSON.

Reference equivalents:
- CsvFile      /root/reference/datafusion/src/datasource/csv.rs:51
               + physical CsvExec (physical_plan/csv.rs:112)
- ParquetTable datasource/parquet.rs:36 + ParquetExec (physical_plan/
               parquet.rs:71; row-group pruning via PruningPredicate :817,
               footer metadata cache :145)
- NdJsonFile   datasource/json.rs:47 + NdJsonExec (physical_plan/json.rs:69)

TPU-native: pyarrow does the host-side parsing/decoding (the reference's
Rust readers); ingestion converts to fixed-width device columns once and
caches them in HBM.  Parquet scans apply projection pushdown at the file
level (only projected columns are read) and row-group pruning with min/max
statistics against pushed-down filters (see physical/pruning.py).
"""

from __future__ import annotations

import glob as _glob
import os

import numpy as np

from ..columnar.ingest import arrow_to_table, arrow_type_to_dtype, dtype_to_arrow_type
from ..columnar.table import Table
from ..errors import DataFusionError
from ..ops.base import ExecutionPlan
from ..ops.basic import MemoryExec, concat_tables
from ..types import Field, Schema
from .datasource import Statistics, TableProvider


def _plain_stat(v, dtype):
    """Normalize a parquet stat value to the engine's comparison domain."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, _dt.datetime):
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    if dtype.is_decimal:
        try:
            return int(round(float(v) * 10**dtype.scale))
        except (TypeError, ValueError):
            return None
    return v


def _expand_paths(path: str, exts: tuple[str, ...]) -> list[str]:
    if os.path.isdir(path):
        out = []
        for ext in exts:
            out += sorted(_glob.glob(os.path.join(path, f"*{ext}")))
        if not out:
            out = sorted(
                p for p in _glob.glob(os.path.join(path, "*")) if os.path.isfile(p)
            )
        return out
    matches = sorted(_glob.glob(path))
    return matches if matches else [path]


class _FileTable(TableProvider):
    """Shared: lazy per-column ingestion with device-side cache."""

    def __init__(self):
        self._cache: Table | None = None
        self._cache_proj: tuple | None = None

    def _read_arrow(self, columns: list[str] | None):
        raise NotImplementedError

    def _load_table(self, cols: list[str] | None) -> Table:
        """Read + ingest.  Subclasses may override with a native fast path
        (CsvFile uses native/libdftpu.so when built)."""
        return arrow_to_table(self._read_arrow(cols))

    def scan(self, projection=None, filters=None, limit=None, table_name="") -> ExecutionPlan:
        schema = self.schema()
        if self._cache is None:
            cols = None
            if projection is not None:
                cols = [schema.fields[i].name for i in projection]
            t = self._load_table(cols)
            if projection is not None and self._cache_proj != tuple(schema.names()):
                # cache only the projected subset; a later wider scan re-reads
                self._cache = t
                self._cache_proj = tuple(t.names)
                return MemoryExec(t, t.schema(), None)
            self._cache = t
            self._cache_proj = tuple(t.names)
            return MemoryExec(t, t.schema(), None)
        # cache hit: check the cached projection covers this scan
        want = (
            [schema.fields[i].name for i in projection]
            if projection is not None
            else schema.names()
        )
        if all(n in self._cache.names for n in want):
            sub = self._cache.select(want)
            return MemoryExec(sub, sub.schema(), None)
        self._cache = self._load_table(None)
        self._cache_proj = tuple(self._cache.names)
        sub = self._cache.select(want)
        return MemoryExec(sub, sub.schema(), None)


class CsvFile(_FileTable):
    def __init__(
        self,
        path: str,
        schema: Schema | None = None,
        has_header: bool = True,
        delimiter: str = ",",
        file_extension: str = ".csv",
    ):
        super().__init__()
        import pyarrow.csv as pacsv

        self.paths = _expand_paths(path, (file_extension,))
        self.has_header = has_header
        self.delimiter = delimiter
        self._user_schema = schema
        if schema is None:
            # infer from the first file
            ropts = pacsv.ReadOptions(autogenerate_column_names=not has_header)
            t = pacsv.read_csv(
                self.paths[0],
                read_options=ropts,
                parse_options=pacsv.ParseOptions(delimiter=delimiter),
            )
            self._schema = Schema(
                [
                    Field(n, arrow_type_to_dtype(t.schema.field(n).type), True)
                    for n in t.schema.names
                ]
            )
        else:
            self._schema = schema

    def schema(self) -> Schema:
        return self._schema

    def _load_table(self, cols):
        """Native C++ loader fast path (native/dftpu_native.cpp); falls back
        to pyarrow for unsupported types or when the lib is not built."""
        from .. import native_lib

        parts = []
        for p in self.paths:
            t = native_lib.load_csv(
                p, self._schema, delimiter=self.delimiter, has_header=self.has_header
            )
            if t is None:
                return super()._load_table(cols)
            parts.append(t)
        full = parts[0] if len(parts) == 1 else concat_tables(parts, self._schema)
        if cols is not None:
            full = full.select(cols)
        return full

    def _read_arrow(self, columns):
        import pyarrow as pa
        import pyarrow.csv as pacsv

        tables = []
        col_types = None
        names = None
        if self._user_schema is not None:
            names = [f.name for f in self._user_schema.fields]
            col_types = {
                f.name: dtype_to_arrow_type(f.dtype) for f in self._user_schema.fields
            }
        for p in self.paths:
            ropts = pacsv.ReadOptions(
                column_names=None if self.has_header else names,
                autogenerate_column_names=not self.has_header and names is None,
            )
            copts = pacsv.ConvertOptions(
                column_types=col_types, include_columns=columns
            )
            tables.append(
                pacsv.read_csv(
                    p,
                    read_options=ropts,
                    parse_options=pacsv.ParseOptions(delimiter=self.delimiter),
                    convert_options=copts,
                )
            )
        return pa.concat_tables(tables)


class ParquetTable(_FileTable):
    def __init__(self, path: str):
        super().__init__()
        import pyarrow.parquet as pq

        self.paths = _expand_paths(path, (".parquet", ".parq"))
        # footer metadata (schema + row-group stats), reference parquet.rs:145
        self._meta = pq.ParquetFile(self.paths[0])
        aschema = self._meta.schema_arrow
        self._schema = Schema(
            [
                Field(f.name, arrow_type_to_dtype(f.type), f.nullable)
                for f in aschema
            ]
        )

    def schema(self) -> Schema:
        return self._schema

    def statistics(self) -> Statistics:
        import pyarrow.parquet as pq

        from .datasource import ColumnStatistics

        rows = 0
        size = 0
        col_stats: dict = {}
        complete = {f.name: True for f in self._schema.fields}
        for p in self.paths:
            md = pq.ParquetFile(p).metadata
            rows += md.num_rows
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                size += rg.total_byte_size
                for ci, f in enumerate(self._schema.fields):
                    st = rg.column(ci).statistics
                    if st is None or not st.has_min_max:
                        complete[f.name] = False
                        continue
                    mn = _plain_stat(st.min, f.dtype)
                    mx = _plain_stat(st.max, f.dtype)
                    if mn is None or mx is None:
                        complete[f.name] = False
                        continue
                    cs = col_stats.setdefault(
                        f.name, ColumnStatistics(null_count=0, min_value=mn, max_value=mx)
                    )
                    cs.min_value = min(cs.min_value, mn)
                    cs.max_value = max(cs.max_value, mx)
                    if st.null_count is None or cs.null_count is None:
                        cs.null_count = None
                    else:
                        cs.null_count += st.null_count
        col_stats = {n: s for n, s in col_stats.items() if complete.get(n)}
        return Statistics(
            num_rows=rows,
            total_byte_size=size,
            is_exact=True,
            column_statistics=col_stats or None,
        )

    def _read_arrow(self, columns):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tables = [pq.read_table(p, columns=columns) for p in self.paths]
        return pa.concat_tables(tables)

    def supports_filter_pushdown(self, expr) -> str:
        return "inexact"  # row-group pruning; rows still re-filtered

    # ---- row-group pruning (reference parquet.rs:817 read_files +
    # physical_optimizer/pruning.rs) -------------------------------------
    def _row_group_stats(self):
        """(ContainerStats, [(path, rg_index)]) over all files' row groups."""
        import pyarrow.parquet as pq

        from ..physical.pruning import ContainerStats

        groups = []
        metas = []
        for p in self.paths:
            md = pq.ParquetFile(p).metadata
            for i in range(md.num_row_groups):
                groups.append((p, i))
                metas.append(md.row_group(i))
        stats = ContainerStats(len(groups))
        stats.num_rows = np.asarray([rg.num_rows for rg in metas], dtype=object)
        for ci, f in enumerate(self._schema.fields):
            mins, maxs, ncs, known = [], [], [], []
            for rg in metas:
                col = rg.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    mins.append(None)
                    maxs.append(None)
                    ncs.append(st.null_count if st is not None else None)
                    known.append(False)
                else:
                    mins.append(_plain_stat(st.min, f.dtype))
                    maxs.append(_plain_stat(st.max, f.dtype))
                    ncs.append(st.null_count)
                    known.append(True)
            stats.set_column(f.name, mins, maxs, ncs, known)
        return stats, groups

    def scan(self, projection=None, filters=None, limit=None, table_name="") -> ExecutionPlan:
        if filters:
            from ..physical.pruning import PruningPredicate

            try:
                stats, groups = self._row_group_stats()
                keep = PruningPredicate(list(filters)).prune(stats)
            except Exception:
                keep = None
            if keep is not None and not keep.all():
                import pyarrow as pa
                import pyarrow.parquet as pq

                cols = (
                    [self._schema.fields[i].name for i in projection]
                    if projection is not None
                    else None
                )
                parts = []
                by_path: dict[str, list[int]] = {}
                for (p, i), k in zip(groups, keep):
                    if k:
                        by_path.setdefault(p, []).append(i)
                for p, idxs in by_path.items():
                    f = pq.ParquetFile(p)
                    parts.append(f.read_row_groups(idxs, columns=cols))
                if parts:
                    t = arrow_to_table(pa.concat_tables(parts))
                else:
                    sch = (
                        self._schema
                        if projection is None
                        else Schema([self._schema.fields[i] for i in projection])
                    )
                    t = Table.empty(sch)
                ex = MemoryExec(t, t.schema(), None, table_name=table_name)
                ex.metrics.counter("row_groups_pruned").add(
                    int(len(groups) - keep.sum())
                )
                ex.metrics.counter("row_groups_matched").add(int(keep.sum()))
                return ex
        return super().scan(projection, filters, limit, table_name)


class NdJsonFile(_FileTable):
    def __init__(self, path: str, schema: Schema | None = None):
        super().__init__()
        import pyarrow.json as pajson

        self.paths = _expand_paths(path, (".json", ".ndjson", ".jsonl"))
        if schema is None:
            t = pajson.read_json(self.paths[0])
            self._schema = Schema(
                [
                    Field(f.name, arrow_type_to_dtype(f.type), True)
                    for f in t.schema
                ]
            )
        else:
            self._schema = schema

    def schema(self) -> Schema:
        return self._schema

    def _read_arrow(self, columns):
        import pyarrow as pa
        import pyarrow.json as pajson

        tables = [pajson.read_json(p) for p in self.paths]
        t = pa.concat_tables(tables)
        if columns is not None:
            t = t.select(columns)
        return t
