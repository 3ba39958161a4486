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
    def __init__(self, inner: ExecutionPlan, root: bool = False):
        super().__init__()
        self.inner = inner
        # a root stage feeds collect() directly: skip the output shrink and
        # its ~28 ms count sync — the collect slices by the (lazy) count
        self.root = root
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
        return self.stage.execute(shrink=not self.root)

    def _display_line(self):
        r = " root" if self.root else ""
        return f"StageExec[fused x{len(self.stage.chain)}{r}]"


class FuseStages:
    name = "fuse_stages"

    def optimize(self, plan: ExecutionPlan) -> ExecutionPlan:
        return self._opt(plan, is_root=True)

    def _opt(self, plan: ExecutionPlan, is_root: bool) -> ExecutionPlan:
        if compilable(plan) and _worth_fusing(plan):
            return StageExec(plan, root=is_root)
        kids = plan.children()
        if not kids:
            return plan
        return plan.with_new_children([self._opt(c, False) for c in kids])


def _worth_fusing(plan: ExecutionPlan) -> bool:
    from ..ops.basic import MemoryExec

    n = 0
    node = plan
    while not isinstance(node, MemoryExec):
        n += 1
        node = node.children()[0]
    return n >= 1
