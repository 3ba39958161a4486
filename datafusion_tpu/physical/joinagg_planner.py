"""Extension planner for CrossJoinAgg (cube_ext/joinagg.rs:144
CrossJoinAggPlanner::plan_extension): plans the fused node's group/agg
expressions against the joined schema, exactly as the reference plans them
against the physical join schema (joinagg.rs:163-183)."""

from __future__ import annotations

from ..errors import PlanError
from ..logical.expr import AggregateFunction, Alias
from ..logical.joinagg import CrossJoinAgg
from ..ops.aggregate import PhysAggExpr
from ..ops.joinagg import CrossJoinAggExec


class CrossJoinAggPlanner:
    def plan_extension(self, node, planner):
        if not isinstance(node, CrossJoinAgg):
            return None
        from .planner import create_physical_expr

        left_exec = planner.create_physical_plan(node.left)
        right_exec = planner.create_physical_plan(node.right)
        joined = node.join_schema()

        condition = (
            create_physical_expr(node.condition, joined)
            if node.condition is not None
            else None
        )

        out_fields = node.schema().fields
        group = []
        for ge, f in zip(node.group_expr, out_fields[: len(node.group_expr)]):
            group.append((create_physical_expr(ge, joined), f.qualified_name))
        aggs = []
        for ae, f in zip(node.aggr_expr, out_fields[len(node.group_expr):]):
            e = ae.expr if isinstance(ae, Alias) else ae
            if not isinstance(e, AggregateFunction):
                raise PlanError(f"aggregate expr expected, got {e!r}")
            arg = create_physical_expr(e.args[0], joined) if e.args else None
            udf = getattr(e, "udf", None)
            aggs.append(PhysAggExpr(e.fun, arg, f.qualified_name, e.distinct, udf))

        return CrossJoinAggExec(left_exec, right_exec, condition, group, aggs)
