"""FilterPushDown: move predicates toward scans.

Equivalent of /root/reference/datafusion/src/optimizer/filter_push_down.rs
(1,548 LoC): splits conjunctions and pushes each conjunct as deep as its
column references allow — through Projections (substituting aliased exprs),
through inner Joins/CrossJoins to the owning side, through SubqueryAlias
(re-qualifying), through Union (cloned per input), through Sort, merging
adjacent Filters.  Conservative with outer joins: predicates only push to
the preserved side.
"""

from __future__ import annotations

from ..logical.expr import (
    Alias,
    Column,
    Expr,
    Literal,
    collect_columns,
    expr_contains,
    transform_expr,
)
from ..logical import plan as L
from ..logical.plan import LogicalPlan
from .optimizer import OptimizerRule, conjunction, split_conjunction, transform_plan_up


class FilterPushDown(OptimizerRule):
    name = "filter_push_down"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        return transform_plan_up(plan, _push)


def _push(plan: LogicalPlan) -> LogicalPlan:
    if not isinstance(plan, L.Filter):
        return plan
    conjuncts = split_conjunction(plan.predicate)
    new_input, rest = _push_conjuncts(plan.input, conjuncts)
    pred = conjunction(rest)
    return L.Filter(pred, new_input) if pred is not None else new_input


def _refs_ok(e: Expr, schema) -> bool:
    """All columns of e resolvable in schema (and e is deterministic)."""
    from ..logical.expr import ScalarFunction

    if expr_contains(
        e,
        lambda n: isinstance(n, ScalarFunction) and n.name in ("random", "now"),
    ):
        return False
    for rel, name in collect_columns(e):
        try:
            schema.field_from_column(name, rel)
        except Exception:
            return False
    return True


def _push_conjuncts(plan: LogicalPlan, conjuncts: list[Expr]):
    """Try to push each conjunct into `plan`; returns (new_plan,
    unpushable_conjuncts)."""
    if not conjuncts:
        return plan, []

    if isinstance(plan, L.Filter):
        inner, rest = _push_conjuncts(plan.input, conjuncts + split_conjunction(plan.predicate))
        pred = conjunction(rest)
        return (L.Filter(pred, inner) if pred is not None else inner), []

    if isinstance(plan, L.Projection):
        # substitute aliases, then push what only references input columns
        subst = {}
        for e in plan.exprs:
            if isinstance(e, Alias):
                subst[e.name] = e.expr
            elif isinstance(e, Column):
                pass
        in_schema = plan.input.schema()
        pushed, rest = [], []
        for c in conjuncts:
            def fix(n: Expr) -> Expr:
                if isinstance(n, Column) and n.relation is None and n.name in subst:
                    return subst[n.name]
                return n

            c2 = transform_expr(c, fix)
            if _refs_ok(c2, in_schema):
                pushed.append(c2)
            else:
                rest.append(c)
        if pushed:
            inner, left_over = _push_conjuncts(plan.input, pushed)
            pred = conjunction(left_over)
            inner = L.Filter(pred, inner) if pred is not None else inner
            return L.Projection(plan.exprs, inner, plan.alias), rest
        return plan, rest

    if isinstance(plan, L.SubqueryAlias):
        in_schema = plan.input.schema()
        pushed, rest = [], []
        for c in conjuncts:
            # re-qualify columns: alias.col -> inner qualifier (positional)
            ok = True

            def fix(n: Expr) -> Expr:
                nonlocal ok
                if isinstance(n, Column):
                    if n.relation == plan.alias or n.relation is None:
                        # map by name into inner schema
                        try:
                            f = in_schema.field_from_column(n.name, None)
                            return Column(f.name, f.qualifier)
                        except Exception:
                            ok = False
                    else:
                        ok = False
                return n

            c2 = transform_expr(c, fix)
            if ok:
                pushed.append(c2)
            else:
                rest.append(c)
        if pushed:
            inner, left_over = _push_conjuncts(plan.input, pushed)
            pred = conjunction(left_over)
            inner = L.Filter(pred, inner) if pred is not None else inner
            return L.SubqueryAlias(inner, plan.alias), rest
        return plan, rest

    if isinstance(plan, L.Sort):
        inner, rest = _push_conjuncts(plan.input, conjuncts)
        return L.Sort(plan.exprs, inner), rest

    if isinstance(plan, (L.CrossJoin, L.Join)):
        left = plan.left if isinstance(plan, L.CrossJoin) else plan.left
        right = plan.right
        ls = left.schema()
        rs = right.schema()
        jt = "inner" if isinstance(plan, L.CrossJoin) else plan.join_type
        to_left, to_right, rest = [], [], []
        left_ok = jt in ("inner", "left", "semi", "anti")
        right_ok = jt in ("inner", "right")
        for c in conjuncts:
            if left_ok and _refs_ok(c, ls):
                to_left.append(c)
            elif right_ok and _refs_ok(c, rs):
                to_right.append(c)
            else:
                rest.append(c)
        new_left, lo = _push_conjuncts(left, to_left) if to_left else (left, [])
        pred = conjunction(lo)
        new_left = L.Filter(pred, new_left) if pred is not None else new_left
        new_right, ro = _push_conjuncts(right, to_right) if to_right else (right, [])
        pred = conjunction(ro)
        new_right = L.Filter(pred, new_right) if pred is not None else new_right
        if isinstance(plan, L.CrossJoin):
            return L.CrossJoin(new_left, new_right), rest
        return (
            L.Join(new_left, new_right, plan.on, plan.join_type, plan.filter),
            rest,
        )

    if isinstance(plan, L.Union):
        new_inputs = []
        for i in plan.inputs_:
            # map columns by position: union field names match per input
            in_schema = i.schema()
            mapped = []
            ok_all = True
            for c in conjuncts:
                ok = True

                def fix(n: Expr) -> Expr:
                    nonlocal ok
                    if isinstance(n, Column):
                        try:
                            f = in_schema.field_from_column(n.name, None)
                            return Column(f.name, f.qualifier)
                        except Exception:
                            ok = False
                    return n

                c2 = transform_expr(c, fix)
                if not ok:
                    ok_all = False
                    break
                mapped.append(c2)
            if not ok_all:
                return plan, conjuncts
            inner, rest_i = _push_conjuncts(i, mapped)
            pred = conjunction(rest_i)
            new_inputs.append(L.Filter(pred, inner) if pred is not None else inner)
        return L.Union(new_inputs, plan.alias), []

    if isinstance(plan, L.TableScan):
        # record pushed filters on the scan for providers that prune
        # (e.g. parquet row groups); keep them in the plan too (inexact)
        pushable = [c for c in conjuncts if _refs_ok(c, plan.schema())]
        if pushable:
            plan = L.TableScan(
                plan.table_name,
                plan.source,
                plan.projection,
                plan.filters + pushable,
                plan.limit,
            )
        return plan, conjuncts  # scans don't filter exactly; keep the Filter

    if isinstance(plan, L.Aggregate):
        # push conjuncts that reference only group-key columns
        key_names = {g.output_name() for g in plan.group_expr}
        pushed, rest = [], []
        for c in conjuncts:
            cols = collect_columns(c)
            if cols and all(name in key_names for _, name in cols):
                # rewrite group output names back to group exprs
                mapping = {g.output_name(): g for g in plan.group_expr}

                def fix(n: Expr) -> Expr:
                    if isinstance(n, Column) and n.name in mapping:
                        return mapping[n.name]
                    return n

                pushed.append(transform_expr(c, fix))
            else:
                rest.append(c)
        if pushed:
            inner, lo = _push_conjuncts(plan.input, pushed)
            pred = conjunction(lo)
            inner = L.Filter(pred, inner) if pred is not None else inner
            return L.Aggregate(inner, plan.group_expr, plan.aggr_expr), rest
        return plan, rest

    return plan, conjuncts
