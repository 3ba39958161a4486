"""Basic physical operators: scan, projection, filter, limit/skip, union,
empty, values, explain.

Reference equivalents:
- MemoryExec      (/root/reference/datafusion/src/physical_plan/memory.rs:39)
- ProjectionExec  (projection.rs:45)
- FilterExec      (filter.rs:48)  -> mask + cumsum-scatter compaction kernel
- GlobalLimitExec/LocalLimitExec (limit.rs:44,146) -> row-count clamp (live
  rows are always compacted to the front, so LIMIT is O(1))
- SkipExec        (fork OFFSET, skip.rs:41) -> static left-shift
- UnionExec       (union.rs:34) -> buffer concatenation + dict harmonization
- EmptyExec/ExplainExec (empty.rs:37, explain.rs:38)
- CoalesceBatchesExec/CoalescePartitionsExec are unnecessary here: tables are
  single whole buffers by construction (SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.dictionary import StringDict
from ..columnar.table import Table, round_capacity
from ..errors import InternalError
from ..exprs.physical import PhysicalExpr, cast_column, harmonize_strings
from ..types import Field, Schema
from ..types.dtypes import STRING, DataType
from . import kernels as K
from .base import ExecutionPlan


class MemoryExec(ExecutionPlan):
    def __init__(
        self,
        table: Table,
        schema: Schema,
        projection: list[int] | None = None,
        table_name: str = "",
    ):
        super().__init__()
        self.table = table
        self._schema = schema
        self.projection = projection
        # registered-catalog name, when known: lets the distributed planner
        # ship this scan by reference (DistScanExec) instead of by value
        self.table_name = table_name

    def schema(self):
        if self.projection is None:
            return self._schema
        return self._schema.project(self.projection)

    def with_new_children(self, c):
        return self

    def _execute(self) -> Table:
        from ..physical import query_compiler as QC

        bound = QC.bound_view(self)
        if bound is not None:
            # whole-query trace: this scan's output is a program argument
            # (already projected — the binding captures execute()'s shape)
            return bound
        t = self.table
        if self.projection is not None:
            names = [t.names[i] for i in self.projection]
            t = t.select(names)
        return t

    def _display_line(self):
        return f"MemoryExec: {self.table.nrows} rows"


class ProjectionExec(ExecutionPlan):
    def __init__(self, exprs: list[tuple[PhysicalExpr, str]], input: ExecutionPlan):
        super().__init__()
        self.exprs = exprs
        self.input = input

    def schema(self):
        in_schema = self.input.schema()
        return Schema([Field(name, e.dtype, True) for e, name in self.exprs])

    def children(self):
        return [self.input]

    def with_new_children(self, c):
        return ProjectionExec(self.exprs, c[0])

    def _execute(self) -> Table:
        t = self.input.execute()
        cols = [e.evaluate(t) for e, _ in self.exprs]
        names = [name for _, name in self.exprs]
        return Table(names, cols, t.nrows_dev)

    def _display_line(self):
        return f"ProjectionExec: {[n for _, n in self.exprs]}"


class FilterExec(ExecutionPlan):
    def __init__(self, predicate: PhysicalExpr, input: ExecutionPlan):
        super().__init__()
        self.predicate = predicate
        self.input = input

    def schema(self):
        return self.input.schema()

    def children(self):
        return [self.input]

    def with_new_children(self, c):
        return FilterExec(self.predicate, c[0])

    def _execute(self) -> Table:
        t = self.input.execute()
        pred = self.predicate.evaluate(t)
        keep = pred.data.astype(bool) & pred.valid
        datas = tuple(c.data for c in t.columns)
        valids = tuple(c.valid for c in t.columns)
        d2, v2, cnt = K.filter_compact(datas, valids, keep, t.nrows_dev)
        cols = [
            Column(c.dtype, d, v, c.dictionary)
            for c, d, v in zip(t.columns, d2, v2)
        ]
        # count stays on device (capacity is unchanged, so nothing here
        # needs it on the host)
        return Table(t.names, cols, cnt)

    def _display_line(self):
        return f"FilterExec: {self.predicate!r}"


class GlobalLimitExec(ExecutionPlan):
    def __init__(self, n: int, input: ExecutionPlan):
        super().__init__()
        self.n = n
        self.input = input

    def schema(self):
        return self.input.schema()

    def children(self):
        return [self.input]

    def with_new_children(self, c):
        return GlobalLimitExec(self.n, c[0])

    def _execute(self) -> Table:
        t = self.input.execute()
        return Table(
            t.names, t.columns, jnp.minimum(t.nrows_dev, np.int64(self.n))
        )

    def _display_line(self):
        return f"GlobalLimitExec: {self.n}"


class SkipExec(ExecutionPlan):
    """OFFSET (fork's skip.rs:41): shift live rows left by n."""

    def __init__(self, n: int, input: ExecutionPlan):
        super().__init__()
        self.n = n
        self.input = input

    def schema(self):
        return self.input.schema()

    def children(self):
        return [self.input]

    def with_new_children(self, c):
        return SkipExec(self.n, c[0])

    def _execute(self) -> Table:
        t = self.input.execute()
        n = min(self.n, t.nrows)
        if n == 0:
            return t
        cols = []
        for c in t.columns:
            data = jnp.concatenate([c.data[n:], jnp.zeros(n, c.data.dtype)])
            valid = jnp.concatenate([c.valid[n:], jnp.zeros(n, bool)])
            cols.append(Column(c.dtype, data, valid, c.dictionary))
        return Table(t.names, cols, t.nrows - n)

    def _display_line(self):
        return f"SkipExec: {self.n}"


class UnionExec(ExecutionPlan):
    def __init__(self, inputs: list[ExecutionPlan], schema: Schema):
        super().__init__()
        self.inputs = inputs
        self._schema = schema

    def schema(self):
        return self._schema

    def children(self):
        return list(self.inputs)

    def with_new_children(self, c):
        return UnionExec(list(c), self._schema)

    def _execute(self) -> Table:
        tables = [i.execute() for i in self.inputs]
        return concat_tables(tables, self._schema)

    def _display_line(self):
        return "UnionExec"


# jitted device-concat programs, keyed on (per-piece capacities, storage
# dtypes, out capacity) — morsel merges call concat with the same shapes
# every query, so one compiled program serves the whole session
_CONCAT_JIT: dict = {}


def concat_tables(tables: list[Table], schema: Schema) -> Table:
    """Concatenate live rows of several tables into one compacted table,
    casting to the target schema and merging string dictionaries.

    Device-side and sync-free: pieces are stitched with ascending
    dynamic_update_slice at traced offsets (each piece's dead tail is
    overwritten by the next piece), in ONE jitted program whose shapes
    depend only on piece capacities — a morsel merge used to pay one
    count sync per piece plus dozens of eager dispatches per column."""
    names = schema.names()
    pieces_by_col: list[list[Column]] = []
    dictionaries: list = []
    for i, f in enumerate(schema.fields):
        pieces = [cast_column(t.columns[i], f.dtype) for t in tables]
        if f.dtype.is_string:
            live_dicts = [
                p.dictionary for p in pieces
                if p.dictionary is not None and len(p.dictionary) > 0
            ]
            distinct = {id(d): d for d in live_dicts}
            if len(distinct) <= 1:
                # common case (morsel outputs share the host table's
                # dictionary): no remap, no per-piece gathers
                merged = live_dicts[0] if live_dicts else StringDict.empty()
                pieces = [
                    Column(STRING, p.data, p.valid, merged) for p in pieces
                ]
            else:
                val_arrays = [d.values.astype(str) for d in distinct.values()]
                all_vals = np.unique(np.concatenate(val_arrays))
                merged = StringDict(all_vals.astype(object))
                new_pieces = []
                for p in pieces:
                    if p.dictionary is None or len(p.dictionary) == 0:
                        new_pieces.append(Column(STRING, p.data, p.valid, merged))
                    else:
                        remap = np.searchsorted(
                            all_vals, p.dictionary.values.astype(str)
                        ).astype(np.int32)
                        out = jnp.asarray(remap)[jnp.clip(p.data, 0, len(remap) - 1)]
                        new_pieces.append(Column(STRING, out, p.valid, merged))
                pieces = new_pieces
            dictionaries.append(merged)
        else:
            dictionaries.append(None)
        pieces_by_col.append(pieces)

    m = len(tables)
    ncols = len(schema.fields)
    caps = tuple(t.capacity for t in tables)
    storages = tuple(f.dtype.storage_np_dtype() for f in schema.fields)
    out_cap = round_capacity(sum(caps))
    key = (caps, tuple(str(s) for s in storages), out_cap)
    fn = _CONCAT_JIT.get(key)
    if fn is None:

        def program(datas, valids, nrows):
            offs = []
            off = jnp.int64(0)
            for n in nrows:
                offs.append(off)
                off = off + jnp.maximum(n, 0)
            total = off
            out_d, out_v = [], []
            for j in range(ncols):
                d0 = jnp.zeros(out_cap, storages[j])
                v0 = jnp.zeros(out_cap, bool)
                for i in range(m):
                    d = datas[i][j].astype(storages[j])
                    v = valids[i][j] & (jnp.arange(caps[i]) < nrows[i])
                    # ascending writes: piece i's dead tail lands in piece
                    # i+1's region and is overwritten by the next write
                    d0 = jax.lax.dynamic_update_slice(d0, d, (offs[i],))
                    v0 = jax.lax.dynamic_update_slice(v0, v, (offs[i],))
                out_d.append(d0)
                out_v.append(v0)
            return tuple(out_d), tuple(out_v), total

        fn = jax.jit(program)
        if len(_CONCAT_JIT) > 256:
            _CONCAT_JIT.clear()
        _CONCAT_JIT[key] = fn

    datas = tuple(
        tuple(pieces_by_col[j][i].data for j in range(ncols)) for i in range(m)
    )
    valids = tuple(
        tuple(pieces_by_col[j][i].valid for j in range(ncols)) for i in range(m)
    )
    nrows = tuple(jnp.asarray(t.nrows_dev) for t in tables)
    out_d, out_v, total = fn(datas, valids, nrows)
    out_cols = [
        Column(f.dtype, d, v, dic)
        for f, dic, d, v in zip(schema.fields, dictionaries, out_d, out_v)
    ]
    return Table(names, out_cols, total)


class EmptyExec(ExecutionPlan):
    def __init__(self, schema: Schema, produce_one_row: bool = False):
        super().__init__()
        self._schema = schema
        self.produce_one_row = produce_one_row

    def schema(self):
        return self._schema

    def with_new_children(self, c):
        return self

    def _execute(self) -> Table:
        t = Table.empty(self._schema)
        if self.produce_one_row:
            # one all-null row
            return Table(t.names, t.columns, 1)
        return t

    def _display_line(self):
        return f"EmptyExec: one_row={self.produce_one_row}"


class ExplainExec(ExecutionPlan):
    def __init__(self, schema: Schema, rows: list[tuple[str, str]]):
        super().__init__()
        self._schema = schema
        self.rows = rows

    def schema(self):
        return self._schema

    def with_new_children(self, c):
        return self

    def _execute(self) -> Table:
        return Table.from_pydict(
            {
                "plan_type": [r[0] for r in self.rows],
                "plan": [r[1] for r in self.rows],
            }
        )

    def _display_line(self):
        return "ExplainExec"
