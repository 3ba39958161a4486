"""LogicalPlanBuilder: programmatic plan construction.

Equivalent of /root/reference/datafusion/src/logical_plan/builder.rs — used
by the DataFrame API, the SQL planner, and tests.
"""

from __future__ import annotations

from typing import Optional

from ..errors import PlanError
from .dfschema import DFSchema
from .expr import (
    Alias,
    Column,
    Expr,
    SortExpr,
    Wildcard,
    find_aggregate_exprs,
    find_window_exprs,
)
from .plan import (
    Aggregate,
    CrossJoin,
    Distinct,
    EmptyRelation,
    Filter,
    Join,
    Limit,
    LogicalPlan,
    Projection,
    Repartition,
    Skip,
    Sort,
    SubqueryAlias,
    TableScan,
    Union,
    Window,
)


class LogicalPlanBuilder:
    def __init__(self, plan: LogicalPlan):
        self.plan = plan

    # ---- sources -----------------------------------------------------------
    @staticmethod
    def empty(produce_one_row: bool = False) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(EmptyRelation(produce_one_row, DFSchema.empty()))

    @staticmethod
    def scan(table_name: str, provider, projection=None) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(TableScan(table_name, provider, projection))

    # ---- transforms ----------------------------------------------------------
    def project(self, exprs: list[Expr], alias: str | None = None) -> "LogicalPlanBuilder":
        exprs = self._expand_wildcards(exprs)
        return LogicalPlanBuilder(Projection(exprs, self.plan, alias))

    def _expand_wildcards(self, exprs: list[Expr]) -> list[Expr]:
        out: list[Expr] = []
        schema = self.plan.schema()
        for e in exprs:
            if isinstance(e, Wildcard):
                for f in schema.fields:
                    if e.qualifier is None or f.qualifier == e.qualifier:
                        out.append(Column(f.name, f.qualifier))
            else:
                out.append(e)
        return out

    def filter(self, predicate: Expr) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(Filter(predicate, self.plan))

    def aggregate(self, group_expr: list[Expr], aggr_expr: list[Expr]) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(Aggregate(self.plan, group_expr, aggr_expr))

    def window(self, window_expr: list[Expr]) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(Window(self.plan, window_expr))

    def sort(self, exprs: list[SortExpr]) -> "LogicalPlanBuilder":
        exprs = [
            e if isinstance(e, SortExpr) else SortExpr(e, True, False) for e in exprs
        ]
        return LogicalPlanBuilder(Sort(exprs, self.plan))

    def limit(self, n: int) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(Limit(n, self.plan))

    def skip(self, n: int) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(Skip(n, self.plan))

    def distinct(self) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(Distinct(self.plan))

    def alias(self, name: str) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(SubqueryAlias(self.plan, name))

    def join(
        self,
        right: "LogicalPlanBuilder | LogicalPlan",
        join_type: str,
        on: list[tuple[Column, Column]],
        filter: Optional[Expr] = None,
    ) -> "LogicalPlanBuilder":
        r = right.plan if isinstance(right, LogicalPlanBuilder) else right
        return LogicalPlanBuilder(Join(self.plan, r, on, join_type, filter))

    def cross_join(self, right: "LogicalPlanBuilder | LogicalPlan") -> "LogicalPlanBuilder":
        r = right.plan if isinstance(right, LogicalPlanBuilder) else right
        return LogicalPlanBuilder(CrossJoin(self.plan, r))

    def union(self, other: "LogicalPlanBuilder | LogicalPlan") -> "LogicalPlanBuilder":
        o = other.plan if isinstance(other, LogicalPlanBuilder) else other
        inputs: list[LogicalPlan] = []
        for p in (self.plan, o):
            if isinstance(p, Union):
                inputs += p.inputs_
            else:
                inputs.append(p)
        return LogicalPlanBuilder(Union(inputs))

    def repartition(self, partitioning: str, n: int, exprs: list[Expr] = ()) -> "LogicalPlanBuilder":
        return LogicalPlanBuilder(
            Repartition(self.plan, partitioning, n, list(exprs))
        )

    def build(self) -> LogicalPlan:
        return self.plan
