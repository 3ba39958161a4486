"""Physical optimizer rules that exploit output_sort_order() hints.

Reference equivalents:
  SortedAggregateRule     planner.rs:1667 compute_aggregation_strategy —
                          choose AggregateStrategy::InplaceSorted when the
                          input is already sorted on the group keys
  EliminateRedundantSort  the OptimizerHints consumers (merge planning in
                          planner.rs:753-851 picks MergeJoin over re-sort)
"""

from __future__ import annotations

from ..exprs.physical import PhysCol
from ..ops.aggregate import HashAggregateExec
from ..ops.base import ExecutionPlan
from ..ops.sort import SortExec
from ..ops.sorted import SortedAggregateExec


def _rewrite(plan: ExecutionPlan, fn) -> ExecutionPlan:
    kids = plan.children()
    if kids:
        plan = plan.with_new_children([_rewrite(c, fn) for c in kids])
    return fn(plan)


class SortedAggregateRule:
    """HashAggregate -> SortedAggregate when the input's guaranteed sort
    order leads with exactly the group-key columns."""

    name = "sorted_aggregate"

    def optimize(self, plan: ExecutionPlan) -> ExecutionPlan:
        def fn(p):
            if not isinstance(p, HashAggregateExec) or not p.group_expr:
                return p
            if any(a.distinct for a in p.aggr_expr):
                return p
            order = p.input.output_sort_order()
            if order is None:
                return p
            key_idx = []
            for e, _ in p.group_expr:
                if not isinstance(e, PhysCol):
                    return p
                key_idx.append(e.index)
            leading = [i for i, _, _ in order[: len(key_idx)]]
            # grouping only needs equal keys adjacent: direction-agnostic
            if sorted(leading) != sorted(key_idx) :
                return p
            return SortedAggregateExec(p.mode, p.group_expr, p.aggr_expr, p.input)

        return _rewrite(plan, fn)


class EliminateRedundantSort:
    """Drop a SortExec whose child already guarantees the requested order."""

    name = "eliminate_redundant_sort"

    def optimize(self, plan: ExecutionPlan) -> ExecutionPlan:
        def fn(p):
            if not isinstance(p, SortExec) or p.fetch is not None:
                return p
            want = p.output_sort_order()
            have = p.input.output_sort_order()
            if want is None or have is None:
                return p
            if have[: len(want)] == want:
                return p.input
            return p

        return _rewrite(plan, fn)
