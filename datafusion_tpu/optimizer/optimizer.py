"""OptimizerRule trait + shared expression utilities.

Equivalent of /root/reference/datafusion/src/optimizer/optimizer.rs:27 and
utils (optimizer/utils.rs): each rule is plan -> plan; the session runs the
configured list in order (context.rs:685-695).
"""

from __future__ import annotations

from typing import Optional

from ..logical.expr import BinaryExpr, Expr
from ..logical.plan import LogicalPlan


class OptimizerRule:
    name: str = "rule"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        raise NotImplementedError


def split_conjunction(e: Expr) -> list[Expr]:
    if isinstance(e, BinaryExpr) and e.op == "and":
        return split_conjunction(e.left) + split_conjunction(e.right)
    return [e]


def conjunction(exprs: list[Expr]) -> Optional[Expr]:
    if not exprs:
        return None
    out = exprs[0]
    for e in exprs[1:]:
        out = BinaryExpr(out, "and", e)
    return out


def transform_plan_up(plan: LogicalPlan, fn) -> LogicalPlan:
    """Bottom-up plan rewrite."""
    inputs = plan.inputs()
    if inputs:
        plan = plan.with_inputs([transform_plan_up(i, fn) for i in inputs])
    return fn(plan)
