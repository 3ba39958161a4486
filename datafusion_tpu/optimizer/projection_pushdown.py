"""ProjectionPushDown: prune unused columns at the scans.

Equivalent of /root/reference/datafusion/src/optimizer/
projection_push_down.rs (920 LoC).  This implementation collects every
column reference in the whole plan per qualifier and narrows each
TableScan's projection to the referenced subset — the ingestion-level win
(only referenced columns are transferred to HBM / read from parquet), which
dominates on a columnar TPU engine.
"""

from __future__ import annotations

from ..logical.expr import collect_columns
from ..logical import plan as L
from ..logical.plan import LogicalPlan
from .optimizer import OptimizerRule, transform_plan_up


class ProjectionPushDown(OptimizerRule):
    name = "projection_push_down"

    def optimize(self, plan: LogicalPlan) -> LogicalPlan:
        # collapse Projection-over-Projection first (decorrelation emits
        # narrow pruning projections above wide ones; merging them lets the
        # scan narrow too)
        plan = transform_plan_up(plan, _merge_projections)
        refs: dict[str | None, set[str]] = {}
        # Columns visible in the plan's OUTPUT are required even if no
        # expression references them: a bare `ctx.table("t").collect()` (or
        # scan under only Filter/Sort/Limit/Join pass-through nodes) must
        # keep every scan column (projection_push_down.rs handles this by
        # seeding required_columns from the root schema).
        _mark_output_visible(plan, refs)
        _collect_refs(plan, refs)
        bare = refs.get(None, set())

        def fix(p: LogicalPlan) -> LogicalPlan:
            if not isinstance(p, L.TableScan) or p.projection is not None:
                return p
            names = p.source.schema().names()
            wanted = refs.get(p.table_name, set()) | bare
            proj = [i for i, n in enumerate(names) if n in wanted]
            if not proj:
                proj = [0] if names else []
            if len(proj) == len(names):
                return p
            return L.TableScan(p.table_name, p.source, proj, p.filters, p.limit)

        return transform_plan_up(plan, fix)


def _merge_projections(p: LogicalPlan) -> LogicalPlan:
    """Projection(outer) over Projection(inner) -> one Projection, when the
    outer exprs are plain column refs into the inner projection."""
    if not (
        isinstance(p, L.Projection)
        and isinstance(p.input, L.Projection)
        and p.input.alias is None
    ):
        return p
    inner = p.input
    in_fields = inner.schema().fields
    by_key = {}
    for f, e in zip(in_fields, inner.exprs):
        by_key[(f.qualifier, f.name)] = e
        by_key.setdefault((None, f.name), e)
    from ..logical.expr import Column as C

    new_exprs = []
    for e in p.exprs:
        if not isinstance(e, C):
            return p  # only merge pure column selections
        sub = by_key.get((e.relation, e.name))
        if sub is None:
            return p
        new_exprs.append(sub)
    return L.Projection(new_exprs, inner.input, p.alias)


def _mark_output_visible(plan: LogicalPlan, refs: dict):
    """Seed `refs` with scan columns that flow to the plan output through
    schema-preserving nodes (nodes whose output is *defined* by their own
    expressions — Projection/Aggregate/... — stop the walk)."""
    if isinstance(plan, L.TableScan):
        names = plan.source.schema().names()
        sel = (
            [names[i] for i in plan.projection]
            if plan.projection is not None
            else names
        )
        for n in sel:
            refs.setdefault(plan.table_name, set()).add(n)
        return
    if isinstance(plan, (L.Filter, L.Sort, L.Limit, L.Skip, L.Distinct, L.Repartition)):
        _mark_output_visible(plan.inputs()[0], refs)
        return
    if isinstance(plan, L.Window):
        # window output = input columns + window columns
        _mark_output_visible(plan.inputs()[0], refs)
        return
    if isinstance(plan, (L.Join, L.CrossJoin)):
        for i in plan.inputs():
            _mark_output_visible(i, refs)
        return
    if isinstance(plan, (L.SubqueryAlias, L.Union)):
        for i in plan.inputs():
            for f in i.schema().fields:
                refs.setdefault(f.qualifier, set()).add(f.name)
        return
    # Projection / Aggregate / Extension / ...: output is defined by the
    # node's own expressions, which _collect_refs gathers.


def _collect_refs(plan: LogicalPlan, refs: dict):
    for e in plan.expressions():
        for rel, name in collect_columns(e):
            refs.setdefault(rel, set()).add(name)
    # Distinct and bare projections of '*'-style nodes need all columns of
    # their input; so do set-op style nodes without explicit exprs
    if isinstance(plan, (L.Distinct, L.Union)):
        for i in plan.inputs():
            for f in i.schema().fields:
                refs.setdefault(f.qualifier, set()).add(f.name)
    if isinstance(plan, L.SubqueryAlias):
        # alias renames qualifiers: references to alias.x require inner x
        inner = plan.input.schema()
        wanted = refs.get(plan.alias, set())
        for f in inner.fields:
            if f.name in wanted:
                refs.setdefault(f.qualifier, set()).add(f.name)
    for i in plan.inputs():
        _collect_refs(i, refs)
