"""Morsel-streamed fused stages: run a scan-rooted stage per host morsel.

The reference streams batches through operators so no table ever needs to
be memory-resident (parquet.rs:596-636 blocking-reader partitions,
hash_aggregate.rs partial accumulation).  Here the unit is a MORSEL — a
fixed-capacity device slice of a host-resident table — and the fused
stage program is compiled ONCE for the morsel shape:

  per morsel:  filters/projections (+ AGGREGATE in 'partial' mode)
  merge:       concat morsel outputs -> 'final' aggregate over states
  finish:      remaining chain ops (projections / sort / limit)

Aggregation thus re-uses the same partial->final machinery the
distributed planner uses across chips (planner.rs:526-601's two-phase
split), applied across morsels of one chip — states, not raw rows, are
what accumulates in HBM.
"""

from __future__ import annotations

from ..columnar.table import Table
from ..datasource.host import HostMemoryExec, HostTable
from ..errors import InternalError
from ..exprs.physical import PhysCol
from ..ops.aggregate import HashAggregateExec
from ..ops.base import ExecutionPlan
from ..ops.basic import FilterExec, GlobalLimitExec, MemoryExec, ProjectionExec, concat_tables
from ..ops.sort import SortExec
from .stage_compiler import CompiledStage


class _MorselSource(ExecutionPlan):
    """Placeholder stage source: morsels are passed via src= at execute."""

    def __init__(self, schema):
        super().__init__()
        self._schema = schema

    def schema(self):
        return self._schema

    def children(self):
        return []

    def with_new_children(self, c):
        return self

    def _execute(self) -> Table:
        raise InternalError("_MorselSource executes only via src= morsels")


class MorselStageExec(ExecutionPlan):
    """A fusable chain over a HostMemoryExec source, executed morsel-wise.

    ``chain`` is top-to-bottom: [Limit?, Sort?, Proj*, Agg?, Filter/Proj*]
    (the _fusable_chain grammar).  Everything below (and including) the
    aggregate runs per morsel; the final aggregate + ops above it run once
    on the merged states."""

    def __init__(self, chain: list, source: HostMemoryExec, root: bool = False):
        super().__init__()
        self.full_chain = list(chain)
        self.source = source
        self.root = root
        self.host: HostTable = source.projected_host()

        # split the chain at the aggregate
        agg_idx = next(
            (
                i
                for i, op in enumerate(chain)
                if isinstance(op, HashAggregateExec)
            ),
            None,
        )
        if agg_idx is not None:
            self.agg: HashAggregateExec | None = chain[agg_idx]
            if self.agg.mode != "single":
                raise InternalError("morsel stage expects a 'single' aggregate")
            self.above = chain[:agg_idx]  # Limit? Sort? Proj*
            below = chain[agg_idx + 1 :]  # Filter/Proj*
        else:
            self.agg = None
            # without an aggregate everything except Sort/Limit runs
            # per-morsel; Sort/Limit merge on the concatenated result
            self.above = [
                op for op in chain if isinstance(op, (SortExec, GlobalLimitExec))
            ]
            below = [
                op
                for op in chain
                if not isinstance(op, (SortExec, GlobalLimitExec))
            ]

        # per-morsel plan over the placeholder source
        src_schema = self.host.schema()
        placeholder = _MorselSource(src_schema)
        per: ExecutionPlan = placeholder
        for op in reversed(below):
            per = op.with_new_children([per])
        if self.agg is not None:
            if any(a.distinct for a in self.agg.aggr_expr):
                # distinct-correct split: partial groups by (keys + values)
                # so morsels emit dedup'd pairs, not over-countable states
                distinct_aggs = [a for a in self.agg.aggr_expr if a.distinct]
                pgroup = list(self.agg.group_expr) + [
                    (a.expr, f"__dv{i}") for i, a in enumerate(distinct_aggs)
                ]
                paggs = [a for a in self.agg.aggr_expr if not a.distinct]
                per = HashAggregateExec("partial", pgroup, paggs, per)
                self._distinct_values = len(distinct_aggs)
            else:
                per = HashAggregateExec(
                    "partial", self.agg.group_expr, self.agg.aggr_expr, per
                )
                self._distinct_values = 0
        self.per_morsel_plan = per
        self.stage = CompiledStage(per, source_node=placeholder)

    # ------------------------------------------------------------------
    def schema(self):
        return self.full_chain[0].schema()

    def children(self):
        return []

    def with_new_children(self, c):
        return self

    def _display_line(self):
        r = " root" if self.root else ""
        return (
            f"MorselStageExec[fused x{len(self.full_chain)}{r}, "
            f"{self.host.num_morsels} morsels x {self.host.morsel_rows}]"
        )

    # ------------------------------------------------------------------
    def _execute(self) -> Table:
        host = self.host
        m = host.num_morsels
        outs: list[Table] = []
        nxt = host.morsel(0)
        for i in range(m):
            cur = nxt
            if i + 1 < m:
                # issue the next H2D upload BEFORE consuming this morsel's
                # outputs: jax dispatch is async, so the transfer rides
                # under the current morsel's compute (double buffering)
                nxt = host.morsel(i + 1)
            outs.append(self.stage.execute(shrink=True, src=cur))

        merged = (
            outs[0]
            if len(outs) == 1
            else concat_tables(outs, self.per_morsel_plan.schema())
        )
        node: ExecutionPlan = MemoryExec(merged, self.per_morsel_plan.schema())
        if self.agg is not None:
            pschema = self.per_morsel_plan.schema()
            final_group = [
                (PhysCol(pschema.fields[i].name, i, pschema.fields[i].dtype), name)
                for i, (_, name) in enumerate(self.agg.group_expr)
            ]
            node = HashAggregateExec(
                "final",
                final_group,
                self.agg.aggr_expr,
                node,
                distinct_values=self._distinct_values,
            )
        for op in reversed(self.above):
            node = op.with_new_children([node])
        return node.execute()
