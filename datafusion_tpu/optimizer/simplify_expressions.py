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
from .optimizer import OptimizerRule, conjunction, split_conjunction, transform_plan_up


class SimplifyExpressions(OptimizerRule):
    name = "simplify_expressions"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        def fix(p: LogicalPlan) -> LogicalPlan:
            return _rewrite_node_exprs(p, lambda e: transform_expr(e, _simplify))

        return transform_plan_up(plan, fix)


def _split_disjunction(e: Expr) -> list[Expr]:
    if isinstance(e, BinaryExpr) and e.op == "or":
        return _split_disjunction(e.left) + _split_disjunction(e.right)
    return [e]


def _extract_common_conjuncts(e: BinaryExpr) -> Expr:
    """(A AND B) OR (A AND C)  =>  A AND (B OR C).

    The reference's simplifier lacks this, but it is load-bearing here:
    TPC-H q19's predicate repeats `p_partkey = l_partkey` inside every OR
    branch, and factoring it out lets EliminateCrossJoins plan a hash join
    instead of an (even tiled) cross product."""
    branches = [split_conjunction(b) for b in _split_disjunction(e)]
    if len(branches) < 2:
        return e
    first = branches[0]
    common = [
        c for c in first if all(any(repr(c) == repr(x) for x in b) for b in branches[1:])
    ]
    if not common:
        return e
    common_reprs = {repr(c) for c in common}
    rests = []
    for b in branches:
        seen = set()
        rest = []
        for x in b:
            r = repr(x)
            # drop ONE instance of each common conjunct per branch
            if r in common_reprs and r not in seen:
                seen.add(r)
                continue
            rest.append(x)
        rests.append(conjunction(rest))
    if any(r is None for r in rests):
        # some branch was exactly the common part: A OR (A AND B) => A
        return conjunction(common)
    out = rests[0]
    for r in rests[1:]:
        out = BinaryExpr(out, "or", r)
    return BinaryExpr(conjunction(common), "and", out)


def _simplify(e: Expr) -> Expr:
    if isinstance(e, Not) and isinstance(e.expr, Not):
        return e.expr.expr
    if isinstance(e, BinaryExpr) and e.op in ("=", "!="):
        for lit, other in ((e.left, e.right), (e.right, e.left)):
            if isinstance(lit, Literal) and lit.value.dtype == BOOL and lit.value.value is not None:
                want_true = lit.value.value == (e.op == "=")
                return other if want_true else Not(other)
    if isinstance(e, BinaryExpr) and e.op == "or":
        return _extract_common_conjuncts(e)
    return e
