"""FuseStages physical-optimizer rule: wrap maximal fusable subtrees in a
StageExec so they execute as one XLA program.

The reference's physical optimizers insert exchanges
(/root/reference/datafusion/src/physical_optimizer/repartition.rs,
merge_exec.rs); the TPU-native analogue optimizes for the opposite axis —
minimizing host->device dispatches by whole-stage compilation.

Compiled stages are cached across queries by a structural signature (plan
shape + source column dtypes/capacities/dictionaries), so repeated queries
reuse XLA executables.
"""

from __future__ import annotations

from ..columnar.table import Table
from ..ops.base import ExecutionPlan
from .stage_compiler import CompiledStage, compilable

_STAGE_CACHE: dict = {}


class StageExec(ExecutionPlan):
    def __init__(self, inner: ExecutionPlan):
        super().__init__()
        self.inner = inner
        self.stage = CompiledStage(inner)
        src = self.stage.source.execute()
        sig = (
            inner.display(),
            tuple(
                (str(c.dtype), c.capacity, id(c.dictionary)) for c in src.columns
            ),
        )
        cached = _STAGE_CACHE.get(sig)
        if cached is not None:
            self.stage = cached
        else:
            _STAGE_CACHE[sig] = self.stage

    def schema(self):
        return self.inner.schema()

    def children(self):
        return []

    def with_new_children(self, c):
        return self

    def _execute(self) -> Table:
        return self.stage.execute()

    def _display_line(self):
        return f"StageExec[fused x{len(self.stage.chain)}]"


class FuseStages:
    name = "fuse_stages"

    def optimize(self, plan: ExecutionPlan) -> ExecutionPlan:
        if compilable(plan) and _worth_fusing(plan):
            return StageExec(plan)
        kids = plan.children()
        if not kids:
            return plan
        return plan.with_new_children([self.optimize(c) for c in kids])


def _worth_fusing(plan: ExecutionPlan) -> bool:
    from ..ops.basic import MemoryExec

    n = 0
    node = plan
    while not isinstance(node, MemoryExec):
        n += 1
        node = node.children()[0]
    return n >= 1
