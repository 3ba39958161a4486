"""Shared-subtree deduplication: execute repeated subplans ONCE.

A view or CTE referenced twice in one query (TPC-H q15: `revenue0` feeds
both the join and the scalar max subquery) plans as two structurally
identical subtrees, and the reference pays the same double execution
(views inline per use, sql/planner.rs).  Here repeated subtrees are
rewritten to the SAME object after all other physical rules, and
`ExecutionPlan.execute` memoizes per (object, query-epoch) — the second
reference reuses the first's result table instead of recomputing.

Keys are built per-class from the actual operator parameters (expression
reprs, join specs, limits) — NOT from `_display_line`, which elides
expressions for some operators.  Unrecognized operator types key by
object identity (never merged) — conservative by construction.
"""

from __future__ import annotations

from ..ops.aggregate import HashAggregateExec
from ..ops.base import ExecutionPlan
from ..ops.basic import (
    EmptyExec,
    FilterExec,
    GlobalLimitExec,
    MemoryExec,
    ProjectionExec,
    SkipExec,
    UnionExec,
)
from ..ops.join import CrossJoinExec, HashJoinExec
from ..ops.sort import SortExec
from .fuse import StageExec, TailStageExec


def _local_key(p: ExecutionPlan):
    """Class-specific parameter signature (children excluded), or None when
    the type is not recognized (=> never deduplicate it)."""
    if isinstance(p, StageExec):
        return ("stage", p.root, _tree_key(p.inner))
    if isinstance(p, TailStageExec):
        return ("tail", p.root, _tree_key(p.inner))
    if type(p) is MemoryExec:
        # projection changes the output columns of the SAME table object
        return (
            "mem",
            id(p.table),
            tuple(p.projection) if p.projection is not None else None,
        )
    if isinstance(p, ProjectionExec):
        return ("proj", tuple((repr(e), n) for e, n in p.exprs))
    if isinstance(p, FilterExec):
        return ("filter", repr(p.predicate))
    if isinstance(p, HashAggregateExec):
        return (
            "agg",
            p.mode,
            p.distinct_values,
            tuple((repr(e), n) for e, n in p.group_expr),
            tuple(repr(a) for a in p.aggr_expr),
        )
    if isinstance(p, HashJoinExec):
        return (
            "join",
            p.join_type,
            tuple((repr(l), repr(r)) for l, r in p.on),
            repr(p.filter),
        )
    if isinstance(p, CrossJoinExec):
        return ("cross",)
    if isinstance(p, SortExec):
        return ("sort", tuple(repr(s) for s in p.sort_exprs))
    if isinstance(p, GlobalLimitExec):
        return ("limit", p.n)
    if isinstance(p, SkipExec):
        return ("skip", p.n)
    if isinstance(p, UnionExec):
        return ("union",)
    if isinstance(p, EmptyExec):
        return ("empty", tuple(p.schema().names()))
    return None


def _tree_key(p: ExecutionPlan):
    lk = _local_key(p)
    if lk is None:
        return ("id", id(p))
    return (type(p).__name__, lk) + tuple(_tree_key(c) for c in p.children())


def _expensive(p: ExecutionPlan) -> bool:
    from ..ops.window import WindowAggExec

    if isinstance(p, (HashAggregateExec, HashJoinExec, SortExec, WindowAggExec)):
        return True
    return any(_expensive(c) for c in p.children())


class ShareCommonSubtrees:
    """Physical rule (run BEFORE fusion): merge repeated raw subtrees into
    one marked instance.  FuseStages treats marked nodes as stage
    boundaries, so both referencing contexts fuse AROUND the shared work
    instead of absorbing separately-shaped copies of it — q15's revenue0
    view would otherwise fuse as [view+5 ops] on one side and
    [max over view+2 ops] on the other, defeating sharing."""

    def optimize(self, plan: ExecutionPlan) -> ExecutionPlan:
        pool: dict = {}

        def walk(p: ExecutionPlan) -> ExecutionPlan:
            kids = p.children()
            if not kids:
                return p  # leaves (scans) are shared data already
            new_kids = [walk(c) for c in kids]
            if any(a is not b for a, b in zip(kids, new_kids)):
                p = p.with_new_children(new_kids)
            key = _tree_key(p)
            if key[0] == "id":
                return p
            prev = pool.setdefault(key, p)
            if prev is not p and _expensive(prev):
                prev._dedup_shared = True
            return prev

        return walk(plan)


class DeduplicateSubtrees:
    """Physical rule (run LAST, after fusion): replace structurally equal
    subtrees with one shared instance."""

    def optimize(self, plan: ExecutionPlan) -> ExecutionPlan:
        pool: dict = {}

        def walk(p: ExecutionPlan) -> ExecutionPlan:
            kids = p.children()
            new_kids = [walk(c) for c in kids]
            if any(a is not b for a, b in zip(kids, new_kids)):
                if isinstance(p, TailStageExec):
                    # with_new_children returns self (the compiled stage
                    # binds the source at execute(src=...)); swap in place
                    p.input_exec = new_kids[0]
                else:
                    p = p.with_new_children(new_kids)
            key = _tree_key(p)
            if key[0] == "id":
                return p
            prev = pool.setdefault(key, p)
            if prev is not p:
                # second occurrence: the shared instance memoizes its
                # result per query epoch (ops/base.py execute)
                prev._dedup_shared = True
            return prev

        return walk(plan)
