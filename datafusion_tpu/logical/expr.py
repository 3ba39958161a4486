"""Logical expression tree + DataFrame expression DSL.

Equivalent of the reference's `Expr` enum and helpers
(/root/reference/datafusion/src/logical_plan/expr.rs:218-375): Column, Alias,
Literal, BinaryExpr, Not, IsNull/IsNotNull, Negative, Between, Case,
Cast/TryCast, Sort, ScalarFunction, AggregateFunction, WindowFunction,
InList, Wildcard — plus subquery expressions (ScalarSubquery, InSubquery,
Exists) which this engine supports natively in the SQL planner and
decorrelates in the optimizer (the TPC-H set requires them).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Optional

from ..errors import PlanError, SchemaError
from ..types import ScalarValue
from ..types.dtypes import (
    DECIMAL_MAX_PRECISION,
    BOOL,
    DATE32,
    FLOAT64,
    INT64,
    INTERVAL_DT,
    INTERVAL_YM,
    NULLTYPE,
    STRING,
    TIMESTAMP_US,
    UINT64,
    DataType,
    decimal,
    numeric_common_type,
)
from .dfschema import DFSchema

# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

COMPARISON_OPS = {"=", "!=", "<", "<=", ">", ">="}
BOOLEAN_OPS = {"and", "or"}
ARITHMETIC_OPS = {"+", "-", "*", "/", "%"}
STRING_OPS = {"like", "not like"}


class Expr:
    """Base logical expression with the builder DSL."""

    # ---- DSL ---------------------------------------------------------------
    def __add__(self, other):
        return BinaryExpr(self, "+", _wrap(other))

    def __radd__(self, other):
        return BinaryExpr(_wrap(other), "+", self)

    def __sub__(self, other):
        return BinaryExpr(self, "-", _wrap(other))

    def __rsub__(self, other):
        return BinaryExpr(_wrap(other), "-", self)

    def __mul__(self, other):
        return BinaryExpr(self, "*", _wrap(other))

    def __rmul__(self, other):
        return BinaryExpr(_wrap(other), "*", self)

    def __truediv__(self, other):
        return BinaryExpr(self, "/", _wrap(other))

    def __rtruediv__(self, other):
        return BinaryExpr(_wrap(other), "/", self)

    def __mod__(self, other):
        return BinaryExpr(self, "%", _wrap(other))

    def __eq__(self, other):  # type: ignore[override]
        return BinaryExpr(self, "=", _wrap(other))

    def __ne__(self, other):  # type: ignore[override]
        return BinaryExpr(self, "!=", _wrap(other))

    def __lt__(self, other):
        return BinaryExpr(self, "<", _wrap(other))

    def __le__(self, other):
        return BinaryExpr(self, "<=", _wrap(other))

    def __gt__(self, other):
        return BinaryExpr(self, ">", _wrap(other))

    def __ge__(self, other):
        return BinaryExpr(self, ">=", _wrap(other))

    def __and__(self, other):
        return BinaryExpr(self, "and", _wrap(other))

    def __or__(self, other):
        return BinaryExpr(self, "or", _wrap(other))

    def __invert__(self):
        return Not(self)

    def __neg__(self):
        return Negative(self)

    def __hash__(self):
        return hash(repr(self))

    def alias(self, name: str) -> "Alias":
        return Alias(self, name)

    def cast(self, dtype: DataType) -> "Cast":
        return Cast(self, dtype)

    def is_null(self) -> "IsNull":
        return IsNull(self)

    def is_not_null(self) -> "IsNotNull":
        return IsNotNull(self)

    def between(self, low, high) -> "Between":
        return Between(self, False, _wrap(low), _wrap(high))

    def in_list(self, values, negated: bool = False) -> "InList":
        return InList(self, [_wrap(v) for v in values], negated)

    def like(self, pattern: str) -> "BinaryExpr":
        return BinaryExpr(self, "like", _wrap(pattern))

    def not_like(self, pattern: str) -> "BinaryExpr":
        return BinaryExpr(self, "not like", _wrap(pattern))

    def sort(self, ascending: bool = True, nulls_first: bool | None = None) -> "SortExpr":
        if nulls_first is None:
            nulls_first = not ascending  # postgres default: NULLS LAST for ASC
        return SortExpr(self, ascending, nulls_first)

    asc = lambda self: self.sort(True)
    desc = lambda self: self.sort(False)

    # ---- tree --------------------------------------------------------------
    def children(self) -> list["Expr"]:
        return []

    def with_children(self, children: list["Expr"]) -> "Expr":
        if children:
            raise PlanError(f"{type(self).__name__} takes no children")
        return self

    # ---- schema ------------------------------------------------------------
    def get_type(self, schema: DFSchema) -> DataType:
        raise NotImplementedError(type(self).__name__)

    def nullable(self, schema: DFSchema) -> bool:
        return True

    def output_name(self) -> str:
        """Display name used as the produced column name (mirrors the
        reference's physical_name / create_name, expr.rs:1453+)."""
        return repr(self)


def _wrap(v: Any) -> Expr:
    if isinstance(v, Expr):
        return v
    return Literal(ScalarValue.of(v))


# ---------------------------------------------------------------------------
# variants
# ---------------------------------------------------------------------------


@dataclass(eq=False, repr=False)
class Column(Expr):
    name: str
    relation: Optional[str] = None

    def get_type(self, schema):
        return schema.field_from_column(self.name, self.relation).dtype

    def nullable(self, schema):
        return schema.field_from_column(self.name, self.relation).nullable

    def __repr__(self):
        return f"{self.relation}.{self.name}" if self.relation else self.name

    def output_name(self):
        return self.name

    @property
    def flat_name(self) -> str:
        return f"{self.relation}.{self.name}" if self.relation else self.name


@dataclass(eq=False, repr=False)
class Alias(Expr):
    expr: Expr
    name: str

    def children(self):
        return [self.expr]

    def with_children(self, c):
        return Alias(c[0], self.name)

    def get_type(self, schema):
        return self.expr.get_type(schema)

    def nullable(self, schema):
        return self.expr.nullable(schema)

    def __repr__(self):
        return f"{self.expr!r} AS {self.name}"

    def output_name(self):
        return self.name


@dataclass(eq=False, repr=False)
class Literal(Expr):
    value: ScalarValue

    def get_type(self, schema):
        return self.value.dtype

    def nullable(self, schema):
        return self.value.is_null

    def __repr__(self):
        if self.value.dtype.is_string and self.value.value is not None:
            return f"'{self.value.value}'"
        return f"{self.value.value}"

    def output_name(self):
        return repr(self)


@dataclass(eq=False, repr=False)
class BinaryExpr(Expr):
    left: Expr
    op: str
    right: Expr

    def children(self):
        return [self.left, self.right]

    def with_children(self, c):
        return BinaryExpr(c[0], self.op, c[1])

    def get_type(self, schema):
        if self.op in COMPARISON_OPS or self.op in BOOLEAN_OPS or self.op in STRING_OPS:
            return BOOL
        lt = self.left.get_type(schema)
        rt = self.right.get_type(schema)
        # temporal arithmetic
        if lt == DATE32 and rt in (INTERVAL_YM, INTERVAL_DT):
            return DATE32
        if lt == TIMESTAMP_US and rt in (INTERVAL_YM, INTERVAL_DT):
            return TIMESTAMP_US
        if rt == DATE32 and lt in (INTERVAL_YM, INTERVAL_DT):
            return DATE32
        if rt == TIMESTAMP_US and lt in (INTERVAL_YM, INTERVAL_DT):
            return TIMESTAMP_US
        if lt == DATE32 and rt == DATE32 and self.op == "-":
            return INT64  # day difference
        if self.op == "/" and lt.is_decimal and rt.is_decimal:
            # decimal division widens scale; engine computes in float64
            return FLOAT64
        if self.op == "*" and lt.is_decimal and rt.is_decimal:
            return decimal(DECIMAL_MAX_PRECISION, lt.scale + rt.scale)
        common = numeric_common_type(lt, rt)
        if common is None:
            if lt == rt:
                return lt
            if lt == NULLTYPE:
                return rt
            if rt == NULLTYPE:
                return lt
            raise PlanError(
                f"cannot coerce {lt!r} {self.op} {rt!r} in {self!r}"
            )
        if self.op == "/" and common.is_integer:
            return common
        return common

    def nullable(self, schema):
        return self.left.nullable(schema) or self.right.nullable(schema)

    def __repr__(self):
        def side(e):
            return f"({e!r})" if isinstance(e, BinaryExpr) else repr(e)

        return f"{side(self.left)} {self.op.upper()} {side(self.right)}"


@dataclass(eq=False, repr=False)
class Not(Expr):
    expr: Expr

    def children(self):
        return [self.expr]

    def with_children(self, c):
        return Not(c[0])

    def get_type(self, schema):
        return BOOL

    def nullable(self, schema):
        return self.expr.nullable(schema)

    def __repr__(self):
        return f"NOT {self.expr!r}"


@dataclass(eq=False, repr=False)
class Negative(Expr):
    expr: Expr

    def children(self):
        return [self.expr]

    def with_children(self, c):
        return Negative(c[0])

    def get_type(self, schema):
        return self.expr.get_type(schema)

    def nullable(self, schema):
        return self.expr.nullable(schema)

    def __repr__(self):
        return f"(- {self.expr!r})"


@dataclass(eq=False, repr=False)
class IsNull(Expr):
    expr: Expr

    def children(self):
        return [self.expr]

    def with_children(self, c):
        return IsNull(c[0])

    def get_type(self, schema):
        return BOOL

    def nullable(self, schema):
        return False

    def __repr__(self):
        return f"{self.expr!r} IS NULL"


@dataclass(eq=False, repr=False)
class IsNotNull(Expr):
    expr: Expr

    def children(self):
        return [self.expr]

    def with_children(self, c):
        return IsNotNull(c[0])

    def get_type(self, schema):
        return BOOL

    def nullable(self, schema):
        return False

    def __repr__(self):
        return f"{self.expr!r} IS NOT NULL"


@dataclass(eq=False, repr=False)
class Between(Expr):
    expr: Expr
    negated: bool
    low: Expr
    high: Expr

    def children(self):
        return [self.expr, self.low, self.high]

    def with_children(self, c):
        return Between(c[0], self.negated, c[1], c[2])

    def get_type(self, schema):
        return BOOL

    def __repr__(self):
        neg = "NOT " if self.negated else ""
        return f"{self.expr!r} {neg}BETWEEN {self.low!r} AND {self.high!r}"


@dataclass(eq=False, repr=False)
class Case(Expr):
    """CASE [expr] WHEN ... THEN ... [ELSE ...] END."""

    expr: Optional[Expr]
    when_then: list[tuple[Expr, Expr]]
    else_expr: Optional[Expr]

    def children(self):
        out = []
        if self.expr is not None:
            out.append(self.expr)
        for w, t in self.when_then:
            out += [w, t]
        if self.else_expr is not None:
            out.append(self.else_expr)
        return out

    def with_children(self, c):
        c = list(c)
        e = c.pop(0) if self.expr is not None else None
        wt = []
        for _ in self.when_then:
            w = c.pop(0)
            t = c.pop(0)
            wt.append((w, t))
        els = c.pop(0) if self.else_expr is not None else None
        return Case(e, wt, els)

    def get_type(self, schema):
        ts = [t.get_type(schema) for _, t in self.when_then]
        if self.else_expr is not None:
            ts.append(self.else_expr.get_type(schema))
        out = ts[0]
        for t in ts[1:]:
            if t == out or t == NULLTYPE:
                continue
            if out == NULLTYPE:
                out = t
                continue
            c = numeric_common_type(out, t)
            if c is None:
                raise PlanError(f"incompatible CASE branch types {out!r} vs {t!r}")
            out = c
        return out

    def __repr__(self):
        s = "CASE "
        if self.expr is not None:
            s += f"{self.expr!r} "
        for w, t in self.when_then:
            s += f"WHEN {w!r} THEN {t!r} "
        if self.else_expr is not None:
            s += f"ELSE {self.else_expr!r} "
        return s + "END"


@dataclass(eq=False, repr=False)
class Cast(Expr):
    expr: Expr
    dtype: DataType
    safe: bool = False  # TryCast when True

    def children(self):
        return [self.expr]

    def with_children(self, c):
        return Cast(c[0], self.dtype, self.safe)

    def get_type(self, schema):
        return self.dtype

    def nullable(self, schema):
        return self.expr.nullable(schema) or self.safe

    def __repr__(self):
        fn = "TRY_CAST" if self.safe else "CAST"
        return f"{fn}({self.expr!r} AS {self.dtype.sql_name()})"

    def output_name(self):
        return self.expr.output_name()


@dataclass(eq=False, repr=False)
class ScalarFunction(Expr):
    name: str
    args: list[Expr]

    def children(self):
        return list(self.args)

    def with_children(self, c):
        return ScalarFunction(self.name, list(c))

    def get_type(self, schema):
        from ..functions.registry import scalar_return_type

        return scalar_return_type(
            self.name, [a.get_type(schema) for a in self.args]
        )

    def __repr__(self):
        return f"{self.name}({', '.join(repr(a) for a in self.args)})"


AGGREGATE_FUNCTIONS = {
    "count",
    "sum",
    "min",
    "max",
    "avg",
    "mean",
    "approx_distinct",
    "array_agg",
    "variance",
    "var_samp",
    "var_pop",
    "stddev",
    "stddev_samp",
    "stddev_pop",
    "covar",
    "covar_samp",
    "covar_pop",
    "corr",
}


@dataclass(eq=False, repr=False)
class AggregateFunction(Expr):
    fun: str  # count/sum/min/max/avg/...
    args: list[Expr]
    distinct: bool = False

    def children(self):
        return list(self.args)

    def with_children(self, c):
        return AggregateFunction(self.fun, list(c), self.distinct)

    def get_type(self, schema):
        from ..functions.aggregates import aggregate_return_type

        arg_types = [a.get_type(schema) for a in self.args]
        return aggregate_return_type(self.fun, arg_types)

    def nullable(self, schema):
        return self.fun not in ("count",)

    def __repr__(self):
        d = "DISTINCT " if self.distinct else ""
        if self.fun == "count" and not self.args:
            return "COUNT(*)"
        return f"{self.fun.upper()}({d}{', '.join(repr(a) for a in self.args)})"


@dataclass(eq=False, repr=False)
class RollingAggregate(Expr):
    """ROLLING(agg [RANGE ...]) inside a ROLLING_WINDOW query — the fork's
    Expr::RollingAggregate (logical_plan/expr.rs:354).  start/end are
    dimension-offset bounds relative to each grid point."""

    agg: "AggregateFunction"
    start: "WindowFrameBound" = None  # default: UNBOUNDED PRECEDING
    end: "WindowFrameBound" = None  # default: CURRENT ROW

    def children(self):
        return [self.agg]

    def with_children(self, c):
        return RollingAggregate(c[0], self.start, self.end)

    def get_type(self, schema):
        return self.agg.get_type(schema)

    def nullable(self, schema):
        return True

    def __repr__(self):
        b = ""
        if self.start is not None or self.end is not None:
            st = self.start
            en = self.end
            b = (
                f" RANGE {getattr(st, 'kind', None)}:{getattr(st, 'offset', None)}"
                f"..{getattr(en, 'kind', None)}:{getattr(en, 'offset', None)}"
            )
        return f"ROLLING({self.agg!r}{b})"


@dataclass(eq=False, repr=False)
class ScalarUDFExpr(Expr):
    """A resolved user-defined scalar function (Expr::ScalarUDF,
    logical_plan/expr.rs; resolved at SQL planning against the registry)."""

    udf: object  # functions.udf.ScalarUDF
    args: list[Expr]

    def children(self):
        return list(self.args)

    def with_children(self, c):
        return ScalarUDFExpr(self.udf, list(c))

    def get_type(self, schema):
        return self.udf.return_type

    def __repr__(self):
        return f"{self.udf.name}({', '.join(repr(a) for a in self.args)})"


@dataclass(eq=False, repr=False)
class AggregateUDFExpr(AggregateFunction):
    """A resolved user-defined aggregate (Expr::AggregateUDF).  Subclasses
    AggregateFunction so aggregate discovery and planning treat it
    uniformly; `fun` is the registered name."""

    udf: object = None  # functions.udf.AggregateUDF

    def with_children(self, c):
        return AggregateUDFExpr(self.fun, list(c), self.distinct, self.udf)

    def get_type(self, schema):
        return self.udf.return_type

    def nullable(self, schema):
        return True


@dataclass(frozen=True)
class WindowFrameBound:
    """Preceding/CurrentRow/Following with optional offset (None=UNBOUNDED)."""

    kind: str  # 'preceding' | 'current' | 'following'
    offset: Optional[int] = None


@dataclass(frozen=True)
class WindowFrame:
    """Mirrors logical_plan/window_frames.rs: ROWS/RANGE/GROUPS + bounds."""

    units: str  # 'rows' | 'range' | 'groups'
    start: WindowFrameBound = WindowFrameBound("preceding", None)
    end: WindowFrameBound = WindowFrameBound("current", None)


@dataclass(eq=False, repr=False)
class WindowFunction(Expr):
    fun: str  # row_number/rank/dense_rank/lag/lead/first_value/... or aggregate
    args: list[Expr]
    partition_by: list[Expr] = field(default_factory=list)
    order_by: list["SortExpr"] = field(default_factory=list)
    frame: Optional[WindowFrame] = None

    def children(self):
        return list(self.args) + list(self.partition_by) + [s.expr for s in self.order_by]

    def with_children(self, c):
        c = list(c)
        na = len(self.args)
        np_ = len(self.partition_by)
        args = c[:na]
        pb = c[na : na + np_]
        ob = [
            SortExpr(e, s.ascending, s.nulls_first)
            for e, s in zip(c[na + np_ :], self.order_by)
        ]
        return WindowFunction(self.fun, args, pb, ob, self.frame)

    def get_type(self, schema):
        from ..functions.windows import window_return_type

        return window_return_type(
            self.fun, [a.get_type(schema) for a in self.args], schema
        )

    def __repr__(self):
        s = f"{self.fun.upper()}({', '.join(repr(a) for a in self.args)})"
        over = []
        if self.partition_by:
            over.append(
                "PARTITION BY " + ", ".join(repr(p) for p in self.partition_by)
            )
        if self.order_by:
            over.append("ORDER BY " + ", ".join(repr(o) for o in self.order_by))
        if self.frame is not None:
            f = self.frame
            over.append(
                f"{f.units.upper()} BETWEEN {f.start.kind}:{f.start.offset} "
                f"AND {f.end.kind}:{f.end.offset}"
            )
        return s + " OVER (" + " ".join(over) + ")"


@dataclass(eq=False, repr=False)
class InList(Expr):
    expr: Expr
    list_: list[Expr]
    negated: bool = False

    def children(self):
        return [self.expr] + list(self.list_)

    def with_children(self, c):
        return InList(c[0], list(c[1:]), self.negated)

    def get_type(self, schema):
        return BOOL

    def __repr__(self):
        neg = "NOT " if self.negated else ""
        return f"{self.expr!r} {neg}IN ({', '.join(repr(e) for e in self.list_)})"


@dataclass(eq=False, repr=False)
class Wildcard(Expr):
    qualifier: Optional[str] = None

    def get_type(self, schema):
        raise PlanError("wildcard has no type; expand it first")

    def __repr__(self):
        return f"{self.qualifier}.*" if self.qualifier else "*"


@dataclass(eq=False, repr=False)
class SortExpr(Expr):
    """Sort specification — only valid inside ORDER BY lists."""

    expr: Expr
    ascending: bool = True
    nulls_first: bool = False

    def children(self):
        return [self.expr]

    def with_children(self, c):
        return SortExpr(c[0], self.ascending, self.nulls_first)

    def get_type(self, schema):
        return self.expr.get_type(schema)

    def __repr__(self):
        d = "ASC" if self.ascending else "DESC"
        n = "NULLS FIRST" if self.nulls_first else "NULLS LAST"
        return f"{self.expr!r} {d} {n}"


@dataclass(eq=False, repr=False)
class OuterColumn(Expr):
    """A correlated reference to a column of an OUTER query, recorded by the
    SQL planner when a subquery expression resolves a name against an
    enclosing scope; consumed by the decorrelation optimizer rule."""

    name: str
    relation: Optional[str] = None
    dtype: Optional[DataType] = None

    def get_type(self, schema):
        if self.dtype is None:
            raise PlanError(f"unresolved outer reference {self!r}")
        return self.dtype

    def nullable(self, schema):
        return True

    def __repr__(self):
        q = f"{self.relation}." if self.relation else ""
        return f"outer({q}{self.name})"


# ---- subquery expressions (this engine supports + decorrelates them) -------


def _subquery_repr(plan) -> str:
    """Single-line rendering of a subquery plan.  MUST identify the
    subquery completely: plan reprs feed the physical-plan cache key
    (ExecutionContext._plan_cache), and a repr that hides the body makes
    two queries differing only inside a subquery collide — the first
    query's compiled plan then silently serves both."""
    return plan.display().replace("\n", " | ")


@dataclass(eq=False, repr=False)
class ScalarSubquery(Expr):
    subquery: Any  # LogicalPlan

    def get_type(self, schema):
        return self.subquery.schema().fields[0].dtype

    def __repr__(self):
        return f"(<scalar subquery: {_subquery_repr(self.subquery)}>)"


@dataclass(eq=False, repr=False)
class InSubquery(Expr):
    expr: Expr
    subquery: Any  # LogicalPlan
    negated: bool = False

    def children(self):
        return [self.expr]

    def with_children(self, c):
        return InSubquery(c[0], self.subquery, self.negated)

    def get_type(self, schema):
        return BOOL

    def __repr__(self):
        neg = "NOT " if self.negated else ""
        return f"{self.expr!r} {neg}IN (<subquery: {_subquery_repr(self.subquery)}>)"


@dataclass(eq=False, repr=False)
class Exists(Expr):
    subquery: Any  # LogicalPlan
    negated: bool = False

    def get_type(self, schema):
        return BOOL

    def __repr__(self):
        neg = "NOT " if self.negated else ""
        return f"{neg}EXISTS (<subquery: {_subquery_repr(self.subquery)}>)"


# ---------------------------------------------------------------------------
# public DSL constructors (mirror prelude: col(), lit(), ...)
# ---------------------------------------------------------------------------


def col(name: str) -> Column:
    if "." in name:
        rel, n = name.rsplit(".", 1)
        return Column(n, rel)
    return Column(name)


def lit(v: Any) -> Literal:
    return Literal(ScalarValue.of(v))


def count(e: Expr) -> AggregateFunction:
    return AggregateFunction("count", [e])


def count_distinct(e: Expr) -> AggregateFunction:
    return AggregateFunction("count", [e], distinct=True)


def sum_(e: Expr) -> AggregateFunction:
    return AggregateFunction("sum", [e])


def min_(e: Expr) -> AggregateFunction:
    return AggregateFunction("min", [e])


def max_(e: Expr) -> AggregateFunction:
    return AggregateFunction("max", [e])


def avg(e: Expr) -> AggregateFunction:
    return AggregateFunction("avg", [e])


def when(condition, then) -> "CaseBuilder":
    return CaseBuilder([( _wrap(condition), _wrap(then))])


class CaseBuilder:
    def __init__(self, when_then):
        self._when_then = when_then

    def when(self, condition, then) -> "CaseBuilder":
        return CaseBuilder(self._when_then + [(_wrap(condition), _wrap(then))])

    def otherwise(self, value) -> Case:
        return Case(None, self._when_then, _wrap(value))

    def end(self) -> Case:
        return Case(None, self._when_then, None)


# ---------------------------------------------------------------------------
# tree utilities
# ---------------------------------------------------------------------------


def transform_expr(e: Expr, fn) -> Expr:
    """Bottom-up rewrite: apply fn to each node after rewriting children
    (the reference's ExprRewriter, expr.rs:975-1010)."""
    kids = e.children()
    if kids:
        new_kids = [transform_expr(k, fn) for k in kids]
        e = e.with_children(new_kids)
    return fn(e)


def expr_contains(e: Expr, pred) -> bool:
    if pred(e):
        return True
    return any(expr_contains(c, pred) for c in e.children())


def collect_columns(e: Expr, out: set | None = None) -> set:
    out = out if out is not None else set()
    if isinstance(e, Column):
        out.add((e.relation, e.name))
    for c in e.children():
        collect_columns(c, out)
    return out


def find_aggregate_exprs(exprs: list[Expr]) -> list[Expr]:
    """All AggregateFunction nodes in the trees (sql/utils.rs equivalent).
    Does not descend into ROLLING() — those belong to the rolling-window
    node (find_rolling_aggregate_exprs is separate, sql/utils.rs)."""
    found: list[Expr] = []

    def visit(e: Expr):
        if isinstance(e, RollingAggregate):
            return
        if isinstance(e, AggregateFunction):
            found.append(e)
            return
        for c in e.children():
            visit(c)

    for e in exprs:
        visit(e)
    return found


def find_rolling_aggregate_exprs(exprs: list[Expr]) -> list[Expr]:
    found: list[Expr] = []

    def visit(e: Expr):
        if isinstance(e, RollingAggregate):
            found.append(e)
            return
        for c in e.children():
            visit(c)

    for e in exprs:
        visit(e)
    return found


def find_window_exprs(exprs: list[Expr]) -> list[Expr]:
    found: list[Expr] = []

    def visit(e: Expr):
        if isinstance(e, WindowFunction):
            found.append(e)
            return
        for c in e.children():
            visit(c)

    for e in exprs:
        visit(e)
    return found
