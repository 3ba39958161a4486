"""CrossJoinAgg: aggregate fused over a (filtered) cross join.

Reference: /root/reference/datafusion/src/cube_ext/joinagg.rs:43
(UserDefinedLogicalNode CrossJoinAgg) produced by the FoldCrossJoinAggregate
optimizer rule (joinagg.rs:96) so an Aggregate over an arbitrary-condition
cross join never materializes the full |L| x |R| product.

The reference folds Aggregate over its SkewedLeftCrossJoin extension (an
arbitrary-condition join, cube_ext/join.rs:47).  Here the equivalent
pattern after EliminateCrossJoins/FilterPushDown is
``Aggregate(Filter(CrossJoin))`` with a non-equi residual predicate (equi
conjuncts have already been turned into Join nodes), or a bare
``Aggregate(CrossJoin)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .dfschema import DFSchema
from .expr import Expr
from .plan import LogicalPlan


@dataclass(repr=False)
class CrossJoinAgg:
    left: LogicalPlan
    right: LogicalPlan
    condition: Expr | None  # join/filter predicate over the joined schema
    group_expr: list[Expr] = field(default_factory=list)
    aggr_expr: list[Expr] = field(default_factory=list)
    out_schema: DFSchema | None = None

    # ---- UserDefinedLogicalNode duck type --------------------------------
    def schema(self) -> DFSchema:
        return self.out_schema

    def join_schema(self) -> DFSchema:
        return self.left.schema().join(self.right.schema())

    def inputs(self):
        return [self.left, self.right]

    def with_inputs(self, inputs):
        return CrossJoinAgg(
            inputs[0],
            inputs[1],
            self.condition,
            self.group_expr,
            self.aggr_expr,
            self.out_schema,
        )

    def expressions(self):
        es = [] if self.condition is None else [self.condition]
        return es + list(self.group_expr) + list(self.aggr_expr)

    def __repr__(self):
        return (
            f"CrossJoinAgg: on {self.condition!r}, "
            f"group_by={self.group_expr!r}, aggregate={self.aggr_expr!r}"
        )
