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


class AggregateStatistics(OptimizerRule):
    name = "aggregate_statistics"

    def optimize(self, plan):
        def rewrite(p):
            if not isinstance(p, L.Aggregate) or p.group_expr:
                return p
            if not p.aggr_expr or not all(_is_count_star(a) for a in p.aggr_expr):
                return p
            n = _exact_row_count(p.input)
            if n is None:
                return p
            out_fields = p.schema().fields
            exprs = [
                Alias(Literal(ScalarValue(INT64, n)), f.name) for f in out_fields
            ]
            return L.Projection(exprs, L.EmptyRelation(True, DFSchema.empty()))

        return transform_plan_up(plan, rewrite)
