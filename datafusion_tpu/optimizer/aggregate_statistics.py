"""AggregateStatistics: answer COUNT(*) from exact table statistics.

Equivalent of /root/reference/datafusion/src/optimizer/aggregate_statistics.rs
(335 LoC): a no-group, no-filter COUNT(*) over a scan whose provider reports
exact row counts rewrites to a constant — no scan, no device work at all.
(The reference also folds MIN/MAX when column statistics exist; our
Statistics carries only row counts today, so those pass through.)
"""

from __future__ import annotations

from ..logical import plan as L
from ..logical.dfschema import DFSchema
from ..logical.expr import AggregateFunction, Alias, Literal
from ..types import ScalarValue
from ..types.dtypes import INT64
from .optimizer import OptimizerRule, transform_plan_up


def _exact_row_count(plan: L.LogicalPlan) -> int | None:
    """Row count when provably exact with zero work."""
    if isinstance(plan, L.TableScan):
        if plan.filters or plan.limit is not None:
            return None
        st = plan.source.statistics()
        if st.is_exact and st.num_rows is not None:
            return st.num_rows
        return None
    if isinstance(plan, L.SubqueryAlias):
        return _exact_row_count(plan.input)
    if isinstance(plan, L.Projection):
        return _exact_row_count(plan.input)
    return None


def _is_count_star(e) -> bool:
    inner = e.expr if isinstance(e, Alias) else e
    if not isinstance(inner, AggregateFunction):
        return False
    if inner.fun.lower() != "count" or inner.distinct:
        return False
    if not inner.args:
        return True
    a = inner.args[0]
    return isinstance(a, Literal) and a.value.value is not None


def _fold_from_stats(e, plan) -> "Literal | None":
    """Constant for this aggregate from exact statistics, or None.

    COUNT(*) -> row count; MIN/MAX(col) -> column stats (parquet footers)
    when the column has no nulls unaccounted (min/max of non-null values is
    what both the stat and the aggregate mean, so null_count is fine)."""
    from ..types.dtypes import INT64 as _I64

    inner = e.expr if isinstance(e, Alias) else e
    if not isinstance(inner, AggregateFunction):
        return None
    n = _exact_row_count(plan)
    if _is_count_star(e):
        return Literal(ScalarValue(_I64, n)) if n is not None else None
    if inner.fun.lower() not in ("min", "max") or inner.distinct:
        return None
    if len(inner.args) != 1:
        return None
    from ..logical.expr import Column as _Col

    arg = inner.args[0]
    if not isinstance(arg, _Col):
        return None
    # locate the scan + its column stats (same zero-work conditions)
    p = plan
    while isinstance(p, (L.SubqueryAlias, L.Projection)):
        p = p.input
    if not isinstance(p, L.TableScan) or p.filters or p.limit is not None:
        return None
    st = p.source.statistics()
    if not st.is_exact or not st.column_statistics:
        return None
    cs = st.column_statistics.get(arg.name)
    if cs is None:
        return None
    v = cs.min_value if inner.fun.lower() == "min" else cs.max_value
    if v is None:
        return None
    f = p.source.schema().field_with_name(arg.name)
    return Literal(ScalarValue(f.dtype, v))


class AggregateStatistics(OptimizerRule):
    name = "aggregate_statistics"

    def optimize(self, plan):
        def rewrite(p):
            if not isinstance(p, L.Aggregate) or p.group_expr or not p.aggr_expr:
                return p
            folded = [_fold_from_stats(a, p.input) for a in p.aggr_expr]
            if any(f is None for f in folded):
                return p
            out_fields = p.schema().fields
            exprs = [Alias(lit, f.name) for lit, f in zip(folded, out_fields)]
            return L.Projection(exprs, L.EmptyRelation(True, DFSchema.empty()))

        return transform_plan_up(plan, rewrite)
