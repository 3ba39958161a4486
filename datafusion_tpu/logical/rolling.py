"""RollingWindowAggregate: the fork's ROLLING_WINDOW extension node.

Reference: /root/reference/datafusion/src/cube_ext/rolling.rs:55
(UserDefinedLogicalNode RollingWindowAggregate) planned from the SQL
extension `... FROM t ROLLING_WINDOW(DIMENSION d, [PARTITION BY p,]
FROM x TO y EVERY z [, GROUP BY DIMENSION expr])` with `ROLLING(agg
[RANGE bound])` select items (sql/planner.rs:695-780).

Semantics: emit one output row per (partition, grid point) where the grid
is the dense series FROM, FROM+EVERY, ..., TO; each ROLLING(agg) evaluates
over input rows whose dimension falls in [grid + start, grid + end]
(default: everything up to the grid point — cumulative).  Plain aggregates
(with GROUP BY DIMENSION) evaluate per grid bucket, unwindowed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .dfschema import DFField, DFSchema
from .expr import Column, Expr, RollingAggregate
from .plan import LogicalPlan


@dataclass(repr=False)
class RollingWindowAggregate:
    input: LogicalPlan
    dimension: Column
    from_: Expr
    to: Expr
    every: Expr
    partition_by: list[Column] = field(default_factory=list)
    rolling_aggs: list[RollingAggregate] = field(default_factory=list)
    group_by_dimension: Expr | None = None
    aggs: list[Expr] = field(default_factory=list)

    # ---- UserDefinedLogicalNode duck type --------------------------------
    def schema(self) -> DFSchema:
        in_schema = self.input.schema()
        fields = []
        for p in self.partition_by:
            fields.append(in_schema.field_from_column(p.name, p.relation))
        fields.append(
            in_schema.field_from_column(self.dimension.name, self.dimension.relation)
        )
        for r in self.rolling_aggs:
            fields.append(
                DFField(r.output_name(), r.get_type(in_schema), True, None)
            )
        for a in self.aggs:
            fields.append(
                DFField(a.output_name(), a.get_type(in_schema), True, None)
            )
        return DFSchema(fields)

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return RollingWindowAggregate(
            inputs[0],
            self.dimension,
            self.from_,
            self.to,
            self.every,
            self.partition_by,
            self.rolling_aggs,
            self.group_by_dimension,
            self.aggs,
        )

    def expressions(self):
        out = [self.dimension, self.from_, self.to, self.every]
        out += list(self.partition_by)
        out += list(self.rolling_aggs)
        out += list(self.aggs)
        if self.group_by_dimension is not None:
            out.append(self.group_by_dimension)
        return out

    def __repr__(self):
        return (
            f"ROLLING WINDOW: dimension={self.dimension!r}, "
            f"from={self.from_!r}, to={self.to!r}, every={self.every!r}"
        )
