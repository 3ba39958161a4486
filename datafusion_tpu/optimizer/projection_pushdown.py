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
        refs: dict[str | None, set[str]] = {}
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
