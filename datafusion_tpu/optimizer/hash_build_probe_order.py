"""HashBuildProbeOrder: put the smaller input on the join's build side.

Equivalent of /root/reference/datafusion/src/optimizer/hash_build_probe_order.rs
(316 LoC).  Our HashJoinExec builds on the RIGHT and probes with the LEFT
(ops/join.py) — on TPU the build side becomes the gathered/replicated table,
so it should be the smaller one.  When the row-count estimate says the left
side is smaller, swap inputs (reversing the on-pairs and flipping the join
type) and wrap in a projection restoring the original column order.
"""

from __future__ import annotations

from ..logical import plan as L
from ..logical.expr import Column
from .optimizer import OptimizerRule, transform_plan_up

SWAPPABLE = {"inner": "inner", "left": "right", "right": "left", "full": "full"}


def estimate_rows(plan: L.LogicalPlan) -> int | None:
    """Rough row-count estimate (should_swap_join_order's logic)."""
    if isinstance(plan, L.TableScan):
        st = plan.source.statistics()
        n = st.num_rows
        if n is None:
            return None
        if plan.limit is not None:
            n = min(n, plan.limit)
        if plan.filters:
            n = max(n // 2, 1)  # selectivity guess
        return n
    if isinstance(plan, L.Filter):
        n = estimate_rows(plan.input)
        return max(n // 2, 1) if n is not None else None
    if isinstance(plan, (L.Projection, L.Sort, L.SubqueryAlias, L.Window)):
        return estimate_rows(plan.input)
    if isinstance(plan, L.Limit):
        n = estimate_rows(plan.input)
        return min(n, plan.n) if n is not None else plan.n
    if isinstance(plan, L.Aggregate):
        n = estimate_rows(plan.input)
        if n is None:
            return None
        return max(n // 10, 1) if plan.group_expr else 1
    if isinstance(plan, L.Distinct):
        n = estimate_rows(plan.input)
        return max(n // 10, 1) if n is not None else None
    if isinstance(plan, L.Join):
        # equi-joins are overwhelmingly FK-shaped: output ~ the larger
        # (fact) side.  Without this case, multi-join chains never swap
        # and the big fact table lands on the BUILD side — backwards for
        # both the build sort and the fan-out<=1 specialization.
        ln = estimate_rows(plan.left)
        rn = estimate_rows(plan.right)
        if ln is None or rn is None:
            return None
        if plan.join_type in ("semi", "anti"):
            return max(ln // 2, 1)
        return max(ln, rn)
    if isinstance(plan, L.CrossJoin):
        ln = estimate_rows(plan.left)
        rn = estimate_rows(plan.right)
        return ln * rn if ln is not None and rn is not None else None
    if isinstance(plan, L.Union):
        ns = [estimate_rows(i) for i in plan.inputs_]
        return sum(ns) if all(n is not None for n in ns) else None
    if isinstance(plan, L.Skip):
        return estimate_rows(plan.input)
    return None


class HashBuildProbeOrder(OptimizerRule):
    name = "hash_build_probe_order"

    def optimize(self, plan):
        def rewrite(p):
            if not isinstance(p, L.Join) or p.join_type not in SWAPPABLE:
                return p
            ln = estimate_rows(p.left)
            rn = estimate_rows(p.right)
            if ln is None or rn is None or ln >= rn:
                return p  # right (build) is already the smaller side
            swapped = L.Join(
                p.right,
                p.left,
                [(r, l) for l, r in p.on],
                SWAPPABLE[p.join_type],
                p.filter,
            )
            # restore original column order
            orig_fields = p.schema().fields
            exprs = [Column(f.name, f.qualifier) for f in orig_fields]
            return L.Projection(exprs, swapped)

        return transform_plan_up(plan, rewrite)
