"""FoldCrossJoinAggregate (cube_ext/joinagg.rs:96).

Rewrites ``Aggregate(Filter(CrossJoin(l, r)))`` / ``Aggregate(CrossJoin)``
into the fused CrossJoinAgg extension node so the cross product is tiled
and partially aggregated instead of materialized at |L| x |R| rows.

Runs late in the pipeline, after EliminateCrossJoins has converted every
equi-condition CrossJoin+Filter into a Join: what remains above a CrossJoin
is a genuinely non-equi residual predicate (the reference reaches the same
state via its SkewedLeftCrossJoin planner extension)."""

from __future__ import annotations

from ..logical.joinagg import CrossJoinAgg
from ..logical.plan import Aggregate, CrossJoin, Extension, Filter, LogicalPlan
from .optimizer import OptimizerRule, transform_plan_up


class FoldCrossJoinAggregate(OptimizerRule):
    name = "fold_join_aggregate"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        def fix(p: LogicalPlan) -> LogicalPlan:
            if not isinstance(p, Aggregate):
                return p
            inp = p.input
            condition = None
            if isinstance(inp, Filter):
                condition = inp.predicate
                inp = inp.input
            if not isinstance(inp, CrossJoin):
                return p
            return Extension(
                CrossJoinAgg(
                    inp.left,
                    inp.right,
                    condition,
                    p.group_expr,
                    p.aggr_expr,
                    p.schema(),
                )
            )

        return transform_plan_up(plan, fix)
