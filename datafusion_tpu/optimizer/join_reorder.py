"""Cross-join elimination: Filter over comma-join CrossJoin chains ->
left-deep hash-join tree.

The reference plans comma-separated FROM lists as CrossJoins and relies on
the query author using explicit JOINs; its HashBuildProbeOrder rule
(/root/reference/datafusion/src/optimizer/hash_build_probe_order.rs:316)
only swaps join sides.  TPC-H's queries are comma-join style, so this engine
adds the classic greedy connected-component join ordering: collect base
relations and equality predicates, then repeatedly attach the relation
joined by an available equi-predicate (smallest-statistics-first when
known), leaving unconnected relations as cross joins and non-equi conjuncts
as a residual filter.
"""

from __future__ import annotations

from ..logical.expr import BinaryExpr, Column, Expr, collect_columns
from ..logical.plan import CrossJoin, Filter, Join, LogicalPlan
from .optimizer import OptimizerRule, conjunction, split_conjunction, transform_plan_up


class EliminateCrossJoins(OptimizerRule):
    name = "eliminate_cross_joins"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        return transform_plan_up(plan, _rewrite)


def _rewrite(plan: LogicalPlan) -> LogicalPlan:
    if not isinstance(plan, Filter) or not isinstance(plan.input, CrossJoin):
        return plan
    rels = _flatten_cross(plan.input)
    if len(rels) < 2:
        return plan
    conjuncts = split_conjunction(plan.predicate)

    # qualified column -> relation index
    col_owner: dict[tuple, int] = {}
    for i, r in enumerate(rels):
        for f in r.schema().fields:
            col_owner[(f.qualifier, f.name)] = i
            col_owner.setdefault((None, f.name), i)

    def owners(e: Expr) -> set[int]:
        out = set()
        for rel, name in collect_columns(e):
            key = (rel, name)
            if key in col_owner:
                out.add(col_owner[key])
            elif (None, name) in col_owner:
                out.add(col_owner[(None, name)])
        return out

    equi = []  # (left_rel, right_rel, lexpr, rexpr)
    residual = []
    for c in conjuncts:
        if isinstance(c, BinaryExpr) and c.op == "=":
            lo = owners(c.left)
            ro = owners(c.right)
            if len(lo) == 1 and len(ro) == 1 and lo != ro:
                equi.append((lo.pop(), ro.pop(), c.left, c.right))
                continue
        residual.append(c)

    if not equi:
        return plan

    # greedy left-deep construction
    joined = {equi[0][0]}
    current: LogicalPlan = rels[equi[0][0]]
    pending = list(equi)
    remaining_rels = set(range(len(rels))) - joined

    while remaining_rels:
        # find predicates connecting the current tree to a new relation
        attach: dict[int, list] = {}
        for idx, p in enumerate(pending):
            li, ri, le, re_ = p
            if li in joined and ri in remaining_rels:
                attach.setdefault(ri, []).append((idx, le, re_))
            elif ri in joined and li in remaining_rels:
                attach.setdefault(li, []).append((idx, re_, le))
        if attach:
            nxt = min(attach)  # deterministic
            entries = attach[nxt]
            on = [(l, r) for _, l, r in entries]
            used = {i for i, _, _ in entries}
            current = Join(current, rels[nxt], on, "inner")
            joined.add(nxt)
            remaining_rels.discard(nxt)
            pending = [p for i, p in enumerate(pending) if i not in used]
        else:
            nxt = min(remaining_rels)
            current = CrossJoin(current, rels[nxt])
            joined.add(nxt)
            remaining_rels.discard(nxt)
        # predicates now internal to the joined set but unused as keys
        # become residual filters
        still_pending = []
        for p in pending:
            if p[0] in joined and p[1] in joined:
                residual.append(BinaryExpr(p[2], "=", p[3]))
            else:
                still_pending.append(p)
        pending = still_pending

    pred = conjunction(residual)
    return Filter(pred, current) if pred is not None else current


def _flatten_cross(plan: LogicalPlan) -> list[LogicalPlan]:
    if isinstance(plan, CrossJoin):
        return _flatten_cross(plan.left) + _flatten_cross(plan.right)
    return [plan]
