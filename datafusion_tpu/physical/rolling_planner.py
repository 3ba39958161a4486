"""Extension planner for RollingWindowAggregate (cube_ext/rolling.rs:165
Planner::plan_extension)."""

from __future__ import annotations

import numpy as np

from ..columnar.table import Table
from ..errors import PlanError
from ..logical.expr import Alias, RollingAggregate
from ..logical.rolling import RollingWindowAggregate
from ..ops.aggregate import PhysAggExpr
from ..ops.rolling import PhysRollingAgg, RollingWindowAggExec


class RollingWindowPlanner:
    def plan_extension(self, node, planner):
        if not isinstance(node, RollingWindowAggregate):
            return None
        from .planner import create_physical_expr

        input_exec = planner.create_physical_plan(node.input)
        in_schema = node.input.schema()

        dim_expr = create_physical_expr(node.dimension, in_schema)
        dim_f = in_schema.field_from_column(node.dimension.name, node.dimension.relation)
        from ..types import Field

        dim_field = Field(dim_f.qualified_name, dim_f.dtype, True)

        def scalar_of(e, kind):
            """Evaluate a literal expression to a host int
            (expect_non_null_scalar, rolling.rs:196)."""
            pe = create_physical_expr(e, in_schema)
            dummy = Table.empty(in_schema.to_schema())
            col = pe.evaluate(dummy)
            v = np.asarray(col.data[:1])[0]
            ok = bool(np.asarray(col.valid[:1])[0])
            if not ok:
                raise PlanError(f"{kind} must be a non-null constant")
            return int(v)

        from_v = scalar_of(node.from_, "FROM")
        to_v = scalar_of(node.to, "TO")
        every_v = scalar_of(node.every, "EVERY")
        if every_v <= 0:
            raise PlanError("EVERY must be positive")

        def bucket_offset(bound, is_start):
            """WindowFrameBound -> bucket offset (frame_bound_to_diff)."""
            if bound is None:
                return (None if is_start else 0)
            if bound.kind == "current":
                return (0 if is_start else 0)
            if bound.kind == "preceding":
                if bound.offset is None:
                    if is_start:
                        return None  # unbounded
                    raise PlanError("frame end UNBOUNDED PRECEDING is invalid")
                if bound.offset % every_v != 0:
                    raise PlanError(
                        f"ROLLING offset {bound.offset} must be a multiple of EVERY"
                    )
                return bound.offset // every_v
            # following
            if bound.offset is None:
                raise PlanError("UNBOUNDED FOLLOWING is not supported in ROLLING")
            if bound.offset % every_v != 0:
                raise PlanError(
                    f"ROLLING offset {bound.offset} must be a multiple of EVERY"
                )
            return bound.offset // every_v

        partition_by = []
        for p in node.partition_by:
            f = in_schema.field_from_column(p.name, p.relation)
            partition_by.append(
                (create_physical_expr(p, in_schema), f.qualified_name)
            )

        rolling_aggs = []
        for r in node.rolling_aggs:
            agg = r.agg
            arg = create_physical_expr(agg.args[0], in_schema) if agg.args else None
            pa = PhysAggExpr(agg.fun, arg, r.output_name(), agg.distinct)
            pre = bucket_offset(r.start, True)
            post_b = r.end
            if post_b is not None and post_b.kind == "following":
                post = bucket_offset(post_b, False)
            elif post_b is None or post_b.kind == "current":
                post = 0
            else:
                raise PlanError("ROLLING end bound must be CURRENT ROW or FOLLOWING")
            rolling_aggs.append(PhysRollingAgg(pa, pre, post))

        gbd = (
            create_physical_expr(node.group_by_dimension, in_schema)
            if node.group_by_dimension is not None
            else None
        )
        aggs = []
        for a in node.aggs:
            e = a.expr if isinstance(a, Alias) else a
            arg = create_physical_expr(e.args[0], in_schema) if e.args else None
            aggs.append(PhysAggExpr(e.fun, arg, a.output_name(), e.distinct))

        return RollingWindowAggExec(
            input_exec,
            dim_expr,
            dim_field,
            from_v,
            to_v,
            every_v,
            partition_by,
            rolling_aggs,
            gbd,
            aggs,
        )
