"""LogicalPlan: the relational algebra tree.

Equivalent of the reference's 17-variant LogicalPlan enum
(/root/reference/datafusion/src/logical_plan/plan.rs:70-226): Projection,
Filter, Window, Aggregate, Sort, Join, CrossJoin, Repartition, Union,
TableScan, EmptyRelation, Values, Limit, Skip (CubeStore fork's OFFSET),
CreateExternalTable, Explain, Extension — plus Distinct and SubqueryAlias
(which the reference folds into aggregate/projection-alias respectively).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from ..errors import PlanError
from ..types import Schema
from ..types.dtypes import BOOL, DataType, numeric_common_type, NULLTYPE
from .dfschema import DFField, DFSchema
from .expr import (
    AggregateFunction,
    Column,
    Expr,
    SortExpr,
    WindowFunction,
)

JOIN_TYPES = ("inner", "left", "right", "full", "semi", "anti")


class LogicalPlan:
    """Base node.  Every node exposes schema(), inputs(), expressions()."""

    def schema(self) -> DFSchema:
        raise NotImplementedError

    def inputs(self) -> list["LogicalPlan"]:
        return []

    def with_inputs(self, inputs: list["LogicalPlan"]) -> "LogicalPlan":
        if inputs:
            raise PlanError(f"{type(self).__name__} takes no inputs")
        return self

    def expressions(self) -> list[Expr]:
        return []

    # ---- display (logical_plan/display.rs equivalent) ----------------------
    def display(self, indent: int = 0) -> str:
        pad = "  " * indent
        s = pad + self._display_line()
        for i in self.inputs():
            s += "\n" + i.display(indent + 1)
        return s

    def display_graphviz(self) -> str:
        """DOT rendering of the plan tree (logical_plan/display.rs
        GraphvizVisitor equivalent)."""
        lines = [
            "digraph {",
            "  node [shape=box, fontname=monospace];",
        ]
        counter = [0]

        def walk(p) -> int:
            nid = counter[0]
            counter[0] += 1
            label = p._display_line().replace('"', '\\"')
            lines.append(f'  n{nid} [label="{label}"];')
            for i in p.inputs():
                cid = walk(i)
                lines.append(f"  n{nid} -> n{cid};")
            return nid

        walk(self)
        lines.append("}")
        return "\n".join(lines)

    def _display_line(self) -> str:
        return type(self).__name__

    def __repr__(self) -> str:
        return self.display()


@dataclass(repr=False)
class TableScan(LogicalPlan):
    table_name: str
    source: Any  # TableProvider
    projection: Optional[list[int]] = None  # column indices
    filters: list[Expr] = field(default_factory=list)  # pushed-down
    limit: Optional[int] = None

    def schema(self) -> DFSchema:
        s = self.source.schema()
        if self.projection is not None:
            s = s.project(self.projection)
        return DFSchema.from_schema(s, qualifier=self.table_name)

    def _display_line(self):
        proj = ""
        if self.projection is not None:
            names = self.source.schema().names()
            proj = f" projection=[{', '.join(names[i] for i in self.projection)}]"
        filt = f" filters={self.filters}" if self.filters else ""
        lim = f" limit={self.limit}" if self.limit is not None else ""
        return f"TableScan: {self.table_name}{proj}{filt}{lim}"


@dataclass(repr=False)
class EmptyRelation(LogicalPlan):
    produce_one_row: bool = False
    schema_: DFSchema = field(default_factory=DFSchema.empty)

    def schema(self):
        return self.schema_

    def _display_line(self):
        return f"EmptyRelation: produce_one_row={self.produce_one_row}"


@dataclass(repr=False)
class Values(LogicalPlan):
    """VALUES (...), (...): inline literal rows."""

    values: list[list[Expr]]
    schema_: DFSchema = None  # type: ignore

    def schema(self):
        return self.schema_

    def expressions(self):
        return [e for row in self.values for e in row]

    def _display_line(self):
        return f"Values: {len(self.values)} rows"


@dataclass(repr=False)
class Projection(LogicalPlan):
    exprs: list[Expr]
    input: LogicalPlan
    alias: Optional[str] = None

    def schema(self) -> DFSchema:
        in_schema = self.input.schema()
        fields = []
        for e in self.exprs:
            name = e.output_name()
            q = self.alias
            if q is None and isinstance(e, Column):
                q = e.relation or in_schema.field_from_column(e.name, e.relation).qualifier
            fields.append(DFField(name, e.get_type(in_schema), e.nullable(in_schema), q))
        return DFSchema(fields)

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return Projection(self.exprs, inputs[0], self.alias)

    def expressions(self):
        return list(self.exprs)

    def _display_line(self):
        return f"Projection: {', '.join(repr(e) for e in self.exprs)}"


@dataclass(repr=False)
class Filter(LogicalPlan):
    predicate: Expr
    input: LogicalPlan

    def schema(self):
        return self.input.schema()

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return Filter(self.predicate, inputs[0])

    def expressions(self):
        return [self.predicate]

    def _display_line(self):
        return f"Filter: {self.predicate!r}"


@dataclass(repr=False)
class Aggregate(LogicalPlan):
    input: LogicalPlan
    group_expr: list[Expr]
    aggr_expr: list[Expr]  # AggregateFunction (possibly aliased)

    def schema(self) -> DFSchema:
        in_schema = self.input.schema()
        fields = []
        for e in self.group_expr + self.aggr_expr:
            q = None
            if isinstance(e, Column):
                q = e.relation or in_schema.field_from_column(e.name, e.relation).qualifier
            fields.append(
                DFField(e.output_name(), e.get_type(in_schema), e.nullable(in_schema), q)
            )
        return DFSchema(fields)

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return Aggregate(inputs[0], self.group_expr, self.aggr_expr)

    def expressions(self):
        return self.group_expr + self.aggr_expr

    def _display_line(self):
        return (
            f"Aggregate: groupBy=[{', '.join(map(repr, self.group_expr))}], "
            f"aggr=[{', '.join(map(repr, self.aggr_expr))}]"
        )


@dataclass(repr=False)
class Window(LogicalPlan):
    input: LogicalPlan
    window_expr: list[Expr]  # WindowFunction (possibly aliased)

    def schema(self) -> DFSchema:
        in_schema = self.input.schema()
        fields = list(in_schema.fields)
        for e in self.window_expr:
            fields.append(
                DFField(e.output_name(), e.get_type(in_schema), True, None)
            )
        return DFSchema(fields)

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return Window(inputs[0], self.window_expr)

    def expressions(self):
        return list(self.window_expr)

    def _display_line(self):
        return f"Window: {', '.join(map(repr, self.window_expr))}"


@dataclass(repr=False)
class Sort(LogicalPlan):
    exprs: list[SortExpr]
    input: LogicalPlan

    def schema(self):
        return self.input.schema()

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return Sort(self.exprs, inputs[0])

    def expressions(self):
        return list(self.exprs)

    def _display_line(self):
        return f"Sort: {', '.join(repr(e) for e in self.exprs)}"


@dataclass(repr=False)
class Join(LogicalPlan):
    left: LogicalPlan
    right: LogicalPlan
    on: list[tuple[Column, Column]]
    join_type: str = "inner"  # JOIN_TYPES
    filter: Optional[Expr] = None  # non-equi residual condition

    def schema(self) -> DFSchema:
        if self.join_type in ("semi", "anti"):
            return self.left.schema()
        lf = list(self.left.schema().fields)
        rf = list(self.right.schema().fields)
        if self.join_type in ("left", "full"):
            rf = [DFField(f.name, f.dtype, True, f.qualifier) for f in rf]
        if self.join_type in ("right", "full"):
            lf = [DFField(f.name, f.dtype, True, f.qualifier) for f in lf]
        return DFSchema(lf + rf)

    def inputs(self):
        return [self.left, self.right]

    def with_inputs(self, inputs):
        return Join(inputs[0], inputs[1], self.on, self.join_type, self.filter)

    def expressions(self):
        out: list[Expr] = []
        for l, r in self.on:
            out += [l, r]
        if self.filter is not None:
            out.append(self.filter)
        return out

    def _display_line(self):
        on = ", ".join(f"{l!r} = {r!r}" for l, r in self.on)
        f = f" filter={self.filter!r}" if self.filter is not None else ""
        return f"Join({self.join_type}): on=[{on}]{f}"


@dataclass(repr=False)
class CrossJoin(LogicalPlan):
    left: LogicalPlan
    right: LogicalPlan

    def schema(self):
        return self.left.schema().join(self.right.schema())

    def inputs(self):
        return [self.left, self.right]

    def with_inputs(self, inputs):
        return CrossJoin(inputs[0], inputs[1])

    def _display_line(self):
        return "CrossJoin"


@dataclass(repr=False)
class Union(LogicalPlan):
    inputs_: list[LogicalPlan]
    alias: Optional[str] = None

    def schema(self) -> DFSchema:
        first = self.inputs_[0].schema()
        fields = []
        for i, f in enumerate(first.fields):
            dtype = f.dtype
            nullable = f.nullable
            for other in self.inputs_[1:]:
                of = other.schema().fields[i]
                nullable = nullable or of.nullable
                if of.dtype != dtype:
                    c = numeric_common_type(dtype, of.dtype)
                    if c is None:
                        if dtype == NULLTYPE:
                            c = of.dtype
                        elif of.dtype == NULLTYPE:
                            c = dtype
                        else:
                            raise PlanError(
                                f"UNION column {f.name}: {dtype!r} vs {of.dtype!r}"
                            )
                    dtype = c
            fields.append(DFField(f.name, dtype, nullable, self.alias))
        return DFSchema(fields)

    def inputs(self):
        return list(self.inputs_)

    def with_inputs(self, inputs):
        return Union(list(inputs), self.alias)

    def _display_line(self):
        return "Union"


@dataclass(repr=False)
class Distinct(LogicalPlan):
    input: LogicalPlan

    def schema(self):
        return self.input.schema()

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return Distinct(inputs[0])

    def _display_line(self):
        return "Distinct"


@dataclass(repr=False)
class Limit(LogicalPlan):
    n: int
    input: LogicalPlan

    def schema(self):
        return self.input.schema()

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return Limit(self.n, inputs[0])

    def _display_line(self):
        return f"Limit: {self.n}"


@dataclass(repr=False)
class Skip(LogicalPlan):
    """OFFSET n — CubeStore fork extension (plan.rs:193, physical skip.rs)."""

    n: int
    input: LogicalPlan

    def schema(self):
        return self.input.schema()

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return Skip(self.n, inputs[0])

    def _display_line(self):
        return f"Skip: {self.n}"


@dataclass(repr=False)
class Repartition(LogicalPlan):
    """Logical exchange hint (reference plan.rs Repartition variant)."""

    input: LogicalPlan
    partitioning: str  # 'round_robin' | 'hash'
    n: int
    exprs: list[Expr] = field(default_factory=list)

    def schema(self):
        return self.input.schema()

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return Repartition(inputs[0], self.partitioning, self.n, self.exprs)

    def expressions(self):
        return list(self.exprs)

    def _display_line(self):
        return f"Repartition: {self.partitioning}({self.n})"


@dataclass(repr=False)
class SubqueryAlias(LogicalPlan):
    input: LogicalPlan
    alias: str

    def schema(self) -> DFSchema:
        return DFSchema(
            [
                DFField(f.name, f.dtype, f.nullable, self.alias)
                for f in self.input.schema().fields
            ]
        )

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return SubqueryAlias(inputs[0], self.alias)

    def _display_line(self):
        return f"SubqueryAlias: {self.alias}"


@dataclass(repr=False)
class CreateExternalTable(LogicalPlan):
    name: str
    location: str
    file_type: str  # CSV | PARQUET | NDJSON
    has_header: bool
    schema_: Optional[Schema] = None

    def schema(self):
        return DFSchema.empty()

    def _display_line(self):
        return f"CreateExternalTable: {self.name} ({self.file_type}) {self.location}"


@dataclass(repr=False)
class CreateMemoryTable(LogicalPlan):
    """CREATE TABLE name AS SELECT ..."""

    name: str
    input: LogicalPlan

    def schema(self):
        return DFSchema.empty()

    def inputs(self):
        return [self.input]

    def with_inputs(self, inputs):
        return CreateMemoryTable(self.name, inputs[0])

    def _display_line(self):
        return f"CreateMemoryTable: {self.name}"


@dataclass(repr=False)
class Explain(LogicalPlan):
    plan: LogicalPlan
    verbose: bool = False
    analyze: bool = False

    def schema(self) -> DFSchema:
        from ..types.dtypes import STRING

        return DFSchema(
            [DFField("plan_type", STRING, False), DFField("plan", STRING, False)]
        )

    def inputs(self):
        return [self.plan]

    def with_inputs(self, inputs):
        return Explain(inputs[0], self.verbose, self.analyze)

    def _display_line(self):
        return "Explain"


@dataclass(repr=False)
class Extension(LogicalPlan):
    """User-defined logical node (reference plan.rs Extension variant)."""

    node: Any  # UserDefinedLogicalNode duck type: schema(), inputs(), ...

    def schema(self):
        return self.node.schema()

    def inputs(self):
        return self.node.inputs()

    def with_inputs(self, inputs):
        return Extension(self.node.with_inputs(inputs))

    def expressions(self):
        return self.node.expressions()

    def _display_line(self):
        return f"Extension: {self.node}"
