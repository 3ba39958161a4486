"""SortExec equivalent: whole-table lexicographic sort.

Reference: /root/reference/datafusion/src/physical_plan/sort.rs:46
(`lexsort_to_indices` + take per partition) and the fork's merge paths
(merge_sort.rs, sort_preserving_merge.rs).  On TPU a single stable XLA sort
over the whole HBM-resident buffer replaces both the per-partition sort and
the k-way merge — a merge of pre-sorted shards is just the same kernel with
near-sorted input (XLA sort is not adaptive, so there is no separate merge
operator; distributed ORDER BY gathers then sorts).

Also here: TopK (sort + limit fusion, the reference's sort-limit bench case).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table
from ..exprs.physical import PhysicalExpr
from . import kernels as K
from .base import ExecutionPlan


class PhysSortExpr:
    def __init__(self, expr: PhysicalExpr, ascending: bool = True, nulls_first: bool = False):
        self.expr = expr
        self.ascending = ascending
        self.nulls_first = nulls_first

    def __repr__(self):
        return f"{self.expr!r} {'ASC' if self.ascending else 'DESC'}"


class SortExec(ExecutionPlan):
    def __init__(self, sort_exprs: list[PhysSortExpr], input: ExecutionPlan, fetch: int | None = None):
        super().__init__()
        self.sort_exprs = sort_exprs
        self.input = input
        self.fetch = fetch  # TopK fusion

    def schema(self):
        return self.input.schema()

    def children(self):
        return [self.input]

    def with_new_children(self, c):
        return SortExec(self.sort_exprs, c[0], self.fetch)

    def output_sort_order(self):
        from ..exprs.physical import PhysCol

        out = []
        for s in self.sort_exprs:
            if not isinstance(s.expr, PhysCol):
                return None
            out.append((s.expr.index, s.ascending, s.nulls_first))
        return out

    def _execute(self) -> Table:
        t = self.input.execute()
        out = sort_table(t, self.sort_exprs)
        if self.fetch is not None:
            out = Table(
                out.names,
                out.columns,
                jnp.minimum(out.nrows_dev, np.int64(self.fetch)),
            )
        return out

    def _display_line(self):
        f = f" fetch={self.fetch}" if self.fetch is not None else ""
        return f"SortExec: {self.sort_exprs}{f}"


def sort_table(t: Table, sort_exprs: list[PhysSortExpr]) -> Table:
    key_cols = [s.expr.evaluate(t) for s in sort_exprs]
    ordkeys = tuple(K.orderable_key(c.data, c.dtype, c.vrange) for c in key_cols)
    valids = tuple(c.valid for c in key_cols)
    # every table column rides through the sorting network as a payload —
    # zero gathers (see kernels.py co-sorting note)
    payloads = tuple(c.data for c in t.columns) + tuple(c.valid for c in t.columns)
    moved, _ = K.lexsort_apply(
        ordkeys,
        valids,
        payloads,
        t.nrows_dev,
        tuple(not s.ascending for s in sort_exprs),
        tuple(s.nulls_first for s in sort_exprs),
    )
    n = len(t.columns)
    cols = [
        Column(c.dtype, d, v, c.dictionary)
        for c, d, v in zip(t.columns, moved[:n], moved[n:])
    ]
    return Table(t.names, cols, t.nrows_dev)
