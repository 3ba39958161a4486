"""ConstantFolding: evaluate literal-only expressions at plan time.

Equivalent of /root/reference/datafusion/src/optimizer/constant_folding.rs
(843 LoC): literal arithmetic/comparison, boolean simplification with
literals, temporal folding (DATE '1994-01-01' + INTERVAL '1' YEAR becomes a
DATE literal so scans compare against a constant).
"""

from __future__ import annotations

import datetime as _dt

from ..logical.expr import (
    BinaryExpr,
    Cast,
    Expr,
    Literal,
    Negative,
    Not,
    transform_expr,
)
from ..logical.plan import LogicalPlan
from ..types import ScalarValue
from ..types.dtypes import (
    BOOL,
    DATE32,
    FLOAT64,
    INT64,
    INTERVAL_DT,
    INTERVAL_YM,
    TIMESTAMP_US,
)
from .optimizer import OptimizerRule, transform_plan_up

_EPOCH = _dt.date(1970, 1, 1)


class ConstantFolding(OptimizerRule):
    name = "constant_folding"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        def fix(p: LogicalPlan) -> LogicalPlan:
            exprs = p.expressions()
            if not exprs:
                return p
            return _rewrite_node_exprs(p, lambda e: transform_expr(e, fold_expr))

        return transform_plan_up(plan, fix)


def _rewrite_node_exprs(plan: LogicalPlan, fn):
    """Apply fn to every expression field of a plan node."""
    from ..logical import plan as L
    from ..logical.expr import SortExpr

    if isinstance(plan, L.Projection):
        return L.Projection([fn(e) for e in plan.exprs], plan.input, plan.alias)
    if isinstance(plan, L.Filter):
        return L.Filter(fn(plan.predicate), plan.input)
    if isinstance(plan, L.Aggregate):
        return L.Aggregate(
            plan.input, [fn(e) for e in plan.group_expr], [fn(e) for e in plan.aggr_expr]
        )
    if isinstance(plan, L.Sort):
        return L.Sort(
            [SortExpr(fn(s.expr), s.ascending, s.nulls_first) for s in plan.exprs],
            plan.input,
        )
    if isinstance(plan, L.Join):
        on = [(fn(l), fn(r)) for l, r in plan.on]
        filt = fn(plan.filter) if plan.filter is not None else None
        return L.Join(plan.left, plan.right, on, plan.join_type, filt)
    if isinstance(plan, L.Window):
        return L.Window(plan.input, [fn(e) for e in plan.window_expr])
    return plan


def fold_expr(e: Expr) -> Expr:
    if isinstance(e, Not) and isinstance(e.expr, Literal):
        v = e.expr.value
        if v.dtype == BOOL:
            return Literal(ScalarValue.boolean(None if v.value is None else not v.value))
    if isinstance(e, Negative) and isinstance(e.expr, Literal):
        v = e.expr.value
        if v.dtype.is_numeric and v.value is not None:
            return Literal(ScalarValue(v.dtype, -v.value))
    if isinstance(e, Cast) and isinstance(e.expr, Literal):
        return _fold_cast(e) or e
    if not isinstance(e, BinaryExpr):
        return e
    l, r = e.left, e.right
    if not (isinstance(l, Literal) and isinstance(r, Literal)):
        # boolean identities with one literal
        if e.op == "and":
            if _is_bool_lit(l, True):
                return r
            if _is_bool_lit(r, True):
                return l
            if _is_bool_lit(l, False) or _is_bool_lit(r, False):
                return Literal(ScalarValue.boolean(False))
        if e.op == "or":
            if _is_bool_lit(l, False):
                return r
            if _is_bool_lit(r, False):
                return l
            if _is_bool_lit(l, True) or _is_bool_lit(r, True):
                return Literal(ScalarValue.boolean(True))
        return e
    lv, rv = l.value, r.value
    if lv.value is None or rv.value is None:
        return e
    # temporal folding
    if lv.dtype.is_string and rv.dtype in (INTERVAL_YM, INTERVAL_DT) and e.op in ("+", "-"):
        # string literal used as a date (TPC-H q20 even writes
        # 'date 1994-01-01'); coerce before folding
        s = str(lv.value)
        if s.lower().startswith("date "):
            s = s[5:]
        try:
            d = _dt.date.fromisoformat(s.strip())
        except ValueError:
            return e
        lv = ScalarValue.date32(d)
    if lv.dtype == DATE32 and rv.dtype in (INTERVAL_YM, INTERVAL_DT) and e.op in ("+", "-"):
        return Literal(ScalarValue(DATE32, _date_add(lv.value, rv, e.op)))
    if lv.dtype == TIMESTAMP_US and rv.dtype in (INTERVAL_YM, INTERVAL_DT) and e.op in ("+", "-"):
        days = lv.value // 86_400_000_000
        rem = lv.value - days * 86_400_000_000
        nd = _date_add(days, rv, e.op)
        return Literal(ScalarValue(TIMESTAMP_US, nd * 86_400_000_000 + rem))
    # numeric folding
    if lv.dtype.is_numeric and rv.dtype.is_numeric:
        a = lv.value / 10**lv.dtype.scale if lv.dtype.is_decimal else lv.value
        b = rv.value / 10**rv.dtype.scale if rv.dtype.is_decimal else rv.value
        try:
            if e.op == "+":
                out = a + b
            elif e.op == "-":
                out = a - b
            elif e.op == "*":
                out = a * b
            elif e.op == "/":
                if b == 0:
                    return e
                out = a / b if not (isinstance(a, int) and isinstance(b, int)) else _trunc_div(a, b)
            elif e.op == "%":
                if b == 0:
                    return e
                out = a - b * _trunc_div(a, b) if isinstance(a, int) and isinstance(b, int) else None
                if out is None:
                    return e
            elif e.op in ("=", "!=", "<", "<=", ">", ">="):
                import operator

                ops = {
                    "=": operator.eq,
                    "!=": operator.ne,
                    "<": operator.lt,
                    "<=": operator.le,
                    ">": operator.gt,
                    ">=": operator.ge,
                }
                return Literal(ScalarValue.boolean(bool(ops[e.op](a, b))))
            else:
                return e
        except (TypeError, ZeroDivisionError):
            return e
        if isinstance(out, bool):
            return Literal(ScalarValue.boolean(out))
        if isinstance(out, int):
            return Literal(ScalarValue.int64(out))
        return Literal(ScalarValue.float64(float(out)))
    return e


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _is_bool_lit(e: Expr, val: bool) -> bool:
    return (
        isinstance(e, Literal)
        and e.value.dtype == BOOL
        and e.value.value is val
    )


def _fold_cast(e: Cast):
    v = e.expr.value
    if v.value is None:
        return Literal(ScalarValue(e.dtype, None))
    try:
        if e.dtype.is_integer:
            return Literal(ScalarValue(e.dtype, int(float(v.value))))
        if e.dtype.is_float:
            return Literal(ScalarValue(e.dtype, float(v.value)))
        if e.dtype.is_decimal:
            return Literal(
                ScalarValue(e.dtype, int(round(float(v.value) * 10**e.dtype.scale)))
            )
        if e.dtype == DATE32 and v.dtype.is_string:
            d = _dt.date.fromisoformat(str(v.value))
            return Literal(ScalarValue.date32(d))
        if e.dtype == TIMESTAMP_US and v.dtype.is_string:
            ts = _dt.datetime.fromisoformat(str(v.value).replace(" ", "T"))
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            return Literal(ScalarValue.timestamp_us(ts))
        if e.dtype.is_string:
            return Literal(ScalarValue.utf8(str(v.to_python())))
    except (ValueError, TypeError):
        return None
    return None


def _date_add(days: int, interval: ScalarValue, op: str):
    sign = 1 if op == "+" else -1
    if interval.dtype == INTERVAL_DT:
        return days + sign * (interval.value // 86_400_000)
    # months: calendar-aware, clamped
    d = _EPOCH + _dt.timedelta(days=days)
    months = d.year * 12 + (d.month - 1) + sign * interval.value
    y, m = divmod(months, 12)
    m += 1
    import calendar

    day = min(d.day, calendar.monthrange(y, m)[1])
    return (_dt.date(y, m, day) - _EPOCH).days
