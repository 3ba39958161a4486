"""SimplifyExpressions: boolean/structural identities.

Equivalent of /root/reference/datafusion/src/optimizer/
simplify_expressions.rs (532 LoC): NOT(NOT x) => x, x = TRUE => x,
x != FALSE => x, double negation, etc.  (Literal-only folding lives in
constant_folding.py.)
"""

from __future__ import annotations

from ..logical.expr import BinaryExpr, Expr, Literal, Not, transform_expr
from ..logical.plan import LogicalPlan
from ..types.dtypes import BOOL
from .constant_folding import _is_bool_lit, _rewrite_node_exprs
from .optimizer import OptimizerRule, transform_plan_up


class SimplifyExpressions(OptimizerRule):
    name = "simplify_expressions"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        def fix(p: LogicalPlan) -> LogicalPlan:
            return _rewrite_node_exprs(p, lambda e: transform_expr(e, _simplify))

        return transform_plan_up(plan, fix)


def _simplify(e: Expr) -> Expr:
    if isinstance(e, Not) and isinstance(e.expr, Not):
        return e.expr.expr
    if isinstance(e, BinaryExpr) and e.op in ("=", "!="):
        for lit, other in ((e.left, e.right), (e.right, e.left)):
            if isinstance(lit, Literal) and lit.value.dtype == BOOL and lit.value.value is not None:
                want_true = lit.value.value == (e.op == "=")
                return other if want_true else Not(other)
    return e
