"""Push semi/anti joins below inner joins.

Decorrelation rewrites `WHERE col IN (subquery)` / `EXISTS` into a
semi/anti join placed where the WHERE clause sat — ABOVE the query's
whole join tree.  A semi/anti join is a pure filter on its probe side's
attributes, so when every probe-side expression it uses (equi keys +
residual) comes from ONE input of an inner join below it, it commutes
with that join:

    semi(inner(A, B), sub)  ==  inner(semi(A, sub), B)     [keys from A]

(identical for anti: both select/reject pairs purely by A's columns).
Pushing it down filters EARLY: TPC-H q18's `o_orderkey IN (HAVING ...)`
then prunes orders to ~60 rows BEFORE the customer and lineitem joins
instead of semi-joining the fully-joined 6M-row (SF1) table — the same
move every cost-based engine makes, expressed as a rewrite (the
reference has no subqueries and thus no such rule; its HashBuildProbeOrder
at optimizer/hash_build_probe_order.rs is the closest analogue).

The rule recurses: a semi join sinks through every inner join level
whose one side covers its probe columns.
"""

from __future__ import annotations

from ..logical.expr import Column, Expr, expr_contains
from ..logical.plan import Join, LogicalPlan
from .optimizer import OptimizerRule


class PushdownSemiAnti(OptimizerRule):
    name = "semi_join_pushdown"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        return _push(plan)


def _push(plan: LogicalPlan) -> LogicalPlan:
    inputs = plan.inputs()
    if inputs:
        plan = plan.with_inputs([_push(i) for i in inputs])
    if not (isinstance(plan, Join) and plan.join_type in ("semi", "anti")):
        return plan
    return _sink(plan)


def _sink(sj: Join) -> Join:
    probe = sj.left
    if not (isinstance(probe, Join) and probe.join_type == "inner"):
        return sj
    cols = _probe_columns(sj)
    if cols is None:
        return sj
    for side, other, flip in (
        (probe.left, probe.right, False),
        (probe.right, probe.left, True),
    ):
        if _covers(side, cols) and not _covers(other, cols):
            pushed = _sink(Join(side, sj.right, sj.on, sj.join_type, sj.filter))
            if flip:
                return Join(probe.left, pushed, probe.on, "inner", probe.filter)
            return Join(pushed, probe.right, probe.on, "inner", probe.filter)
    return sj


def _probe_columns(sj: Join):
    """Every probe-side Column the semi join reads (left exprs of its equi
    keys + the probe-side references of its residual), or None when the
    residual's sides cannot be separated."""
    cols: list[Column] = []
    for l, _r in sj.on:
        _collect(l, cols)
    if sj.filter is not None:
        # the residual references both the probe and the subquery side;
        # probe-side columns are the ones resolvable in the probe schema
        probe_schema = sj.left.schema()
        sub_schema = sj.right.schema()
        fcols: list[Column] = []
        _collect(sj.filter, fcols)
        for c in fcols:
            in_probe = _resolves(probe_schema, c)
            in_sub = _resolves(sub_schema, c)
            if in_probe and in_sub:
                return None  # ambiguous reference: stay put
            if in_probe:
                cols.append(c)
    return cols


def _collect(e: Expr, out: list):
    def visit(n):
        if isinstance(n, Column):
            out.append(n)
        return n

    from ..logical.expr import transform_expr

    transform_expr(e, visit)
    return out


def _resolves(schema, c: Column) -> bool:
    try:
        schema.field_from_column(c.name, c.relation)
        return True
    except Exception:
        return False


def _covers(side: LogicalPlan, cols: list) -> bool:
    s = side.schema()
    return all(_resolves(s, c) for c in cols)
