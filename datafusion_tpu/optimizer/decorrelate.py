"""Subquery decorrelation: rewrite EXISTS / IN / scalar subqueries into
semi/anti/left joins.

The reference fork does NOT support SQL subqueries; this engine does
(SURVEY.md §7 step 8 notes Q4/Q21/Q22 need semi/anti via EXISTS/IN
rewrites).  Classic Kim/Dayal-style unnesting:

- [NOT] EXISTS (sub)          -> semi/anti join on the sub's correlated
                                 equality predicates; non-equality
                                 correlated predicates become the join's
                                 residual filter (e.g. TPC-H Q21's
                                 l2.l_suppkey <> l1.l_suppkey)
- expr [NOT] IN (sub)         -> semi/anti join on (expr = sub.col) plus
                                 correlated predicates
- cmp with scalar (sub)       -> correlated: group the sub's aggregate by
                                 its correlated columns and LEFT-join on
                                 them (Q2/Q17/Q20); uncorrelated: cross
                                 join the single-row aggregate (Q11/Q15/Q22)

Correlated references were recorded by the SQL planner as OuterColumn
nodes; each rewritten subquery is wrapped in a SubqueryAlias to keep the
joined schema unambiguous.
"""

from __future__ import annotations

import itertools
from typing import Optional

from ..errors import PlanError
from ..logical.expr import (
    AggregateFunction,
    Alias,
    BinaryExpr,
    Column,
    Exists,
    Expr,
    InSubquery,
    IsNotNull,
    IsNull,
    Literal,
    Not,
    OuterColumn,
    ScalarSubquery,
    expr_contains,
    transform_expr,
)
from ..types import ScalarValue
from ..logical.plan import (
    Aggregate,
    CrossJoin,
    Distinct,
    Filter,
    Join,
    Limit,
    LogicalPlan,
    Projection,
    Sort,
    SubqueryAlias,
)
from .optimizer import OptimizerRule, conjunction, split_conjunction, transform_plan_up

_alias_counter = itertools.count()


class DecorrelateSubqueries(OptimizerRule):
    name = "decorrelate_subqueries"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        return _decorrelate(plan)


def _decorrelate(plan: LogicalPlan) -> LogicalPlan:
    inputs = plan.inputs()
    if inputs:
        plan = plan.with_inputs([_decorrelate(i) for i in inputs])
    if isinstance(plan, Filter):
        return _rewrite_filter(plan)
    return plan


def _has_subquery(e: Expr) -> bool:
    return expr_contains(
        e, lambda n: isinstance(n, (Exists, InSubquery, ScalarSubquery))
    )


def _rewrite_filter(f: Filter) -> LogicalPlan:
    conjuncts = split_conjunction(f.predicate)
    plain: list[Expr] = []
    sub_conjuncts: list[Expr] = []
    for c in conjuncts:
        # normalize NOT EXISTS / NOT IN
        if isinstance(c, Not) and isinstance(c.expr, Exists):
            c = Exists(c.expr.subquery, not c.expr.negated)
        if isinstance(c, Not) and isinstance(c.expr, InSubquery):
            c = InSubquery(c.expr.expr, c.expr.subquery, not c.expr.negated)
        (sub_conjuncts if _has_subquery(c) else plain).append(c)
    if not sub_conjuncts:
        return f
    # plain conjuncts filter BELOW the subquery joins so downstream rules
    # (cross-join elimination, filter pushdown) still see Filter-over-
    # CrossJoin shapes; subquery-derived conjuncts go on top
    input_plan = f.input
    pred = conjunction(plain)
    if pred is not None:
        input_plan = Filter(pred, input_plan)
    remaining: list[Expr] = []
    for c in sub_conjuncts:
        new_conjunct, input_plan = _rewrite_conjunct(c, input_plan)
        if new_conjunct is not None:
            remaining.append(new_conjunct)
    pred = conjunction(remaining)
    return Filter(pred, input_plan) if pred is not None else input_plan


def _rewrite_conjunct(c: Expr, input_plan: LogicalPlan):
    """Returns (replacement conjunct or None, new input plan)."""
    if isinstance(c, Exists):
        sub = _decorrelate(c.subquery)
        sub, keys, residual, alias = _extract_correlations(sub)
        jt = "anti" if c.negated else "semi"
        if not keys and residual is None:
            # uncorrelated EXISTS: true iff sub is non-empty — rare; model as
            # cross join against aggregated row count
            raise PlanError("uncorrelated EXISTS not supported yet")
        return None, Join(input_plan, sub, keys, jt, residual)

    if isinstance(c, InSubquery):
        raw_sub = _decorrelate(c.subquery)
        value_field = raw_sub.schema().fields[0]
        sub, keys, residual, alias = _extract_correlations(
            raw_sub, keep_cols=(Column(value_field.name, value_field.qualifier),)
        )
        in_key = (c.expr, Column(value_field.name, alias))
        jt = "anti" if c.negated else "semi"
        plan = Join(input_plan, sub, [in_key] + keys, jt, residual)
        if c.negated and not keys and residual is None:
            # NULL-aware NOT IN (uncorrelated): standard three-valued
            # semantics that a plain anti join misses — ANY null in the
            # subquery disqualifies every probe row, and a NULL probe
            # value qualifies only against an EMPTY subquery.  Cross-join
            # a one-row [count(*), count(value)] aggregate of the
            # subquery and filter on top of the anti join:
            #   count(*) = count(value)            (no nulls in sub)
            #   AND (probe IS NOT NULL OR count(*) = 0)
            # (IN/semi needs nothing: null keys never match, which is
            # exactly the 3VL behavior for the positive form.)
            n = next(_alias_counter)
            total_name, nn_name = f"__naaj_total_{n}", f"__naaj_nn_{n}"
            counts = Aggregate(
                raw_sub,
                [],
                [
                    Alias(AggregateFunction("count", []), total_name),
                    Alias(
                        AggregateFunction(
                            "count",
                            [Column(value_field.name, value_field.qualifier)],
                        ),
                        nn_name,
                    ),
                ],
            )
            plan = CrossJoin(plan, counts)
            total_c, nn_c = Column(total_name, None), Column(nn_name, None)
            guard = BinaryExpr(
                BinaryExpr(total_c, "=", nn_c),
                "and",
                BinaryExpr(
                    IsNotNull(c.expr), "or", BinaryExpr(total_c, "=", Literal(ScalarValue.of(0)))
                ),
            )
            return guard, plan
        if c.negated and keys and residual is None:
            # NULL-aware NOT IN (correlated): same three-valued semantics,
            # but evaluated PER GROUP of the correlation keys — a NULL in
            # row r's group disqualifies r; a NULL probe qualifies only
            # when r's group is empty.  LEFT-join a per-group
            # [count(*), count(value)] aggregate of the stripped subquery
            # on the correlation keys; an unmatched row (total IS NULL)
            # means the group is empty:
            #   total IS NULL OR (total = nn AND probe IS NOT NULL)
            # The anti join above already removed rows matching a non-null
            # subquery value in their group.
            n = next(_alias_counter)
            galias, calias = f"__naaj_g_{n}", f"__naaj_c_{n}"
            total_name, nn_name = f"__naaj_total_{n}", f"__naaj_nn_{n}"
            counts = SubqueryAlias(
                Aggregate(
                    SubqueryAlias(sub.input, galias),
                    [Column(k.name, galias) for (_o, k) in keys],
                    [
                        Alias(AggregateFunction("count", []), total_name),
                        Alias(
                            AggregateFunction(
                                "count", [Column(value_field.name, galias)]
                            ),
                            nn_name,
                        ),
                    ],
                ),
                calias,
            )
            plan = Join(
                plan,
                counts,
                [(outer, Column(k.name, calias)) for (outer, k) in keys],
                "left",
                None,
            )
            total_c = Column(total_name, calias)
            nn_c = Column(nn_name, calias)
            guard = BinaryExpr(
                IsNull(total_c),
                "or",
                BinaryExpr(
                    BinaryExpr(total_c, "=", nn_c), "and", IsNotNull(c.expr)
                ),
            )
            return guard, plan
        return None, plan

    # scalar subquery inside a comparison / arbitrary expression
    subqueries: list[ScalarSubquery] = []

    def collect(n: Expr) -> Expr:
        if isinstance(n, ScalarSubquery):
            subqueries.append(n)
        return n

    transform_expr(c, collect)
    if not subqueries:
        # subquery hidden deeper (e.g. inside Not) — unsupported shape
        raise PlanError(f"unsupported subquery conjunct: {c!r}")

    replacements: dict[int, Expr] = {}
    for sq in subqueries:
        sub = _decorrelate(sq.subquery)
        value_field = sub.schema().fields[0]
        sub2, keys, residual, alias = _extract_correlations(
            sub, keep_cols=(Column(value_field.name, value_field.qualifier),)
        )
        value_col = Column(value_field.name, alias)
        if keys or residual is not None:
            input_plan = Join(input_plan, sub2, keys, "left", residual)
        else:
            input_plan = CrossJoin(input_plan, sub2)
        replacements[id(sq)] = value_col

    def substitute(n: Expr) -> Expr:
        if isinstance(n, ScalarSubquery) and id(n) in replacements:
            return replacements[id(n)]
        return n

    new_c = transform_expr(c, substitute)
    return new_c, input_plan


# ---------------------------------------------------------------------------
# correlation extraction
# ---------------------------------------------------------------------------


def _extract_correlations(sub: LogicalPlan, keep_cols: tuple = ()):
    """Strip correlated predicates out of `sub`.

    Returns (rewritten sub wrapped in SubqueryAlias, join keys
    [(outer_expr, inner Column)], residual filter Expr | None, alias)."""
    keys: list[tuple[Expr, Column]] = []  # (outer side, inner column name)
    residuals: list[Expr] = []
    extra_inner_cols: list[Column] = []

    def strip(plan: LogicalPlan) -> LogicalPlan:
        inputs = plan.inputs()
        if inputs:
            plan = plan.with_inputs([strip(i) for i in inputs])
        if isinstance(plan, Filter):
            conjuncts = split_conjunction(plan.predicate)
            keep = []
            for c in conjuncts:
                if not expr_contains(c, lambda n: isinstance(n, OuterColumn)):
                    keep.append(c)
                    continue
                handled = _classify_correlated(c, keys, residuals, extra_inner_cols)
                if not handled:
                    keep.append(c)  # will fail later with clear error
            pred = conjunction(keep)
            return Filter(pred, plan.input) if pred is not None else plan.input
        return plan

    sub = strip(sub)

    # make sure the inner key/residual columns are visible in sub's output,
    # adding them through Projection/Aggregate layers when needed
    inner_needed = [k[1] for k in keys] + extra_inner_cols
    sub = _expose_columns(sub, inner_needed)

    # the consumer sees the subquery ONLY through the join keys, the
    # residual predicate, and (for IN / scalar subqueries) `keep_cols`:
    # project to exactly those columns so e.g. q21's EXISTS does not drag
    # all 16 lineitem columns through the semi-join build side
    ss = sub.schema()
    proj, seen = [], set()
    for c in list(keep_cols) + inner_needed:
        f = ss.field_from_column(c.name, c.relation)
        key = (f.qualifier, f.name)
        if key not in seen:
            seen.add(key)
            proj.append(Column(f.name, f.qualifier))
    if proj and len(proj) < len(ss.fields):
        sub = Projection(proj, sub)

    alias = f"__sq_{next(_alias_counter)}"
    sub_schema = sub.schema()

    # rebind inner column refs to the aliased subquery output
    def alias_inner(col: Column) -> Column:
        # find the matching output field (by name; qualifier may differ)
        for f in sub_schema.fields:
            if f.name == col.name and (col.relation is None or f.qualifier == col.relation):
                return Column(f.name, alias)
        raise PlanError(f"correlated inner column {col!r} not in subquery output")

    keys2 = []
    for outer_e, inner_c in keys:
        keys2.append((_outer_to_column(outer_e), alias_inner(inner_c)))

    residual = None
    if residuals:
        def fix(n: Expr) -> Expr:
            if isinstance(n, OuterColumn):
                return Column(n.name, n.relation)
            if isinstance(n, Column):
                return alias_inner(n)
            return n

        residual = conjunction([transform_expr(r, fix) for r in residuals])

    return SubqueryAlias(sub, alias), keys2, residual, alias


def _outer_to_column(e: Expr) -> Expr:
    def fix(n: Expr) -> Expr:
        if isinstance(n, OuterColumn):
            return Column(n.name, n.relation)
        return n

    return transform_expr(e, fix)


def _classify_correlated(c: Expr, keys, residuals, extra_inner_cols) -> bool:
    """Equality between an outer expr and an inner column -> join key;
    everything else correlated -> residual."""
    if isinstance(c, BinaryExpr) and c.op == "=":
        l_outer = expr_contains(c.left, lambda n: isinstance(n, OuterColumn))
        r_outer = expr_contains(c.right, lambda n: isinstance(n, OuterColumn))
        if l_outer != r_outer:
            outer_side = c.left if l_outer else c.right
            inner_side = c.right if l_outer else c.left
            if isinstance(inner_side, Column):
                keys.append((outer_side, inner_side))
                return True
    # residual: remember inner columns it references
    def collect(n: Expr) -> Expr:
        if isinstance(n, Column):
            extra_inner_cols.append(n)
        return n

    transform_expr(c, collect)
    residuals.append(c)
    return True


def _expose_columns(plan: LogicalPlan, cols: list[Column]) -> LogicalPlan:
    """Ensure `cols` appear in plan's output schema, extending Projection /
    Aggregate / passing through Sort/Limit wrappers."""
    if not cols:
        return plan
    schema = plan.schema()
    missing = []
    for c in cols:
        try:
            schema.field_from_column(c.name, c.relation)
        except Exception:
            missing.append(c)
        else:
            continue
    # even when present, for Aggregate outputs the column must be a group key
    if isinstance(plan, Projection):
        inner = _expose_columns(plan.input, cols)
        in_schema = inner.schema()
        exprs = list(plan.exprs)
        names = {e.output_name() for e in exprs}
        for c in cols:
            f = in_schema.field_from_column(c.name, c.relation)
            if f.name not in names:
                exprs.append(Column(f.name, f.qualifier))
                names.add(f.name)
        return Projection(exprs, inner, plan.alias)
    if isinstance(plan, Aggregate):
        group = list(plan.group_expr)
        gnames = {g.output_name() for g in group}
        in_schema = plan.input.schema()
        for c in cols:
            f = in_schema.field_from_column(c.name, c.relation)
            if f.name not in gnames:
                group.append(Column(f.name, f.qualifier))
                gnames.add(f.name)
        return Aggregate(plan.input, group, plan.aggr_expr)
    if isinstance(plan, (Sort, Limit, Distinct, Filter)):
        inner = _expose_columns(plan.inputs()[0], cols)
        return plan.with_inputs([inner])
    if isinstance(plan, SubqueryAlias):
        inner = _expose_columns(plan.input, cols)
        return SubqueryAlias(inner, plan.alias)
    # base relations (scans, joins) expose everything already
    return plan
