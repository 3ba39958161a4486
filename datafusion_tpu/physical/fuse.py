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
from ..ops.aggregate import HashAggregateExec
from ..ops.base import ExecutionPlan
from ..ops.sort import SortExec
from ..ops.window import WindowAggExec
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
        # THIS plan's source scan: a cache hit swaps in a CompiledStage
        # built for an earlier (same-signature) plan, so execution must
        # feed the CURRENT table's buffers as arguments — executing the
        # cached stage's own source would replay the FIRST query's data
        # (stale results after re-registering a same-shaped table)
        self._source = self.stage.source
        src = self._source.execute()
        from ..ops import kernels as K

        sig = (
            inner.display(),
            tuple(
                # the vrange-narrowing bit is baked into the cached stage's
                # traced sort/group keys (K.orderable_key): same-shaped
                # tables differing in range must not share a narrowed
                # program (ADVICE r4 #2)
                (
                    str(c.dtype),
                    c.capacity,
                    id(c.dictionary),
                    K.vrange_narrows_i32(c.vrange),
                )
                for c in src.columns
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
        from . import query_compiler as QC

        probe = None
        if QC.active():
            # whole-query trace: integer group-key ranges must be probed
            # on the CONCRETE table (eager min/max on constants), not the
            # tracer view; the plan cache pins the data so the learned
            # ranges stay valid for the life of the program
            probe = QC.concrete_of(self._source)
        return self.stage.execute(
            shrink=not self.root,
            src=self._source.execute(),
            owned=True,
            probe_src=probe,
        )

    def _display_line(self):
        r = " root" if self.root else ""
        return f"StageExec[fused x{len(self.stage.chain)}{r}]"


class TailStageExec(ExecutionPlan):
    """A fusable query TAIL (Limit?/Sort?/Proj*/Agg?/Filter*) above a
    non-fusable input (typically a join): the input executes normally, then
    the whole tail runs as ONE jitted program per input-table signature —
    no per-operator dispatches or count syncs inside the tail."""

    def __init__(self, chain_plan: ExecutionPlan, input_exec: ExecutionPlan, root: bool = False):
        super().__init__()
        self.inner = chain_plan
        self.input_exec = input_exec
        self.root = root
        self.stage = CompiledStage(chain_plan, source_node=input_exec)

    def schema(self):
        return self.inner.schema()

    def children(self):
        return [self.input_exec]

    def with_new_children(self, c):
        return self

    def _execute(self) -> Table:
        t = self.input_exec.execute()
        # the tail's sorts/aggregates run at the input's CAPACITY; a
        # speculative join above a selective filter can hand over a
        # near-empty buffer at probe capacity — right-size first (one
        # count sync, gated to large buffers)
        from ..ops.join import SHRINK_SYNC_MIN_CAP

        t = t.shrink_to_fit(only_if_above=SHRINK_SYNC_MIN_CAP)
        # owned=True: this stage's input comes from the plan itself, so
        # its output capacity is learnable per input signature — repeated
        # runs (and the whole-query trace) right-size without the count
        # sync, recording an overflow flag like the join learned caps
        return self.stage.execute(shrink=not self.root, src=t, owned=True)

    def _display_line(self):
        r = " root" if self.root else ""
        return f"TailStageExec[fused x{len(self.stage.chain)}{r}]"


def _fusable_chain(plan: ExecutionPlan):
    """Longest fusable prefix (same grammar as `compilable`, any source).
    Returns (chain_top_to_bottom, source_below) or (None, None)."""
    from ..ops.aggregate import HashAggregateExec
    from ..ops.basic import FilterExec, GlobalLimitExec, ProjectionExec
    from ..ops.sort import SortExec
    from ..ops.window import WindowAggExec

    from .stage_compiler import node_jit_safe

    def _absorbable(n):
        # a shared subtree (ShareCommonSubtrees) is a stage boundary: both
        # referencing contexts must see the SAME node so its result memo
        # is reused, not two differently-fused copies.  The shared node
        # itself (n is plan) may still head its OWN stage.
        return n is plan or not getattr(n, "_dedup_shared", False)

    chain = []
    node = plan
    if isinstance(node, GlobalLimitExec) and _absorbable(node):
        chain.append(node)
        node = node.input
    if isinstance(node, SortExec) and node_jit_safe(node) and _absorbable(node):
        chain.append(node)
        node = node.input
    while isinstance(node, ProjectionExec) and node_jit_safe(node) and _absorbable(node):
        chain.append(node)
        node = node.input
    if (
        isinstance(node, HashAggregateExec)
        and node.mode in ("single", "partial")
        and node_jit_safe(node)
        and _absorbable(node)
    ):
        chain.append(node)
        node = node.input
    elif isinstance(node, WindowAggExec) and node_jit_safe(node) and _absorbable(node):
        chain.append(node)
        node = node.input
    while isinstance(node, (FilterExec, ProjectionExec)) and node_jit_safe(node) and _absorbable(node):
        chain.append(node)
        node = node.input
    return (chain, node) if chain else (None, None)


class FuseStages:
    name = "fuse_stages"

    def optimize(self, plan: ExecutionPlan) -> ExecutionPlan:
        return self._opt(plan, is_root=True)

    def _try_morsel_join(self, plan: ExecutionPlan, is_root: bool):
        """chain? -> HashJoin(host-chain -> HostMemoryExec, build): stream
        probe morsels through the join against the HBM-resident build side
        (MorselJoinStageExec).  Engages only for join types sound per
        morsel: host-left inner/left/semi/anti, host-right inner/right."""
        from ..datasource.host import HostMemoryExec
        from ..ops.aggregate import HashAggregateExec
        from ..ops.basic import FilterExec, ProjectionExec
        from ..ops.join import HashJoinExec
        from ..ops.window import WindowAggExec
        from .morsel import MorselJoinStageExec

        chain, below = _fusable_chain(plan)
        if chain is None:
            chain, below = [], plan
        if not isinstance(below, HashJoinExec):
            return None
        if any(isinstance(op, WindowAggExec) for op in chain):
            return None  # per-morsel windows would split partitions
        for host_on_left, child, other in (
            (True, below.left, below.right),
            (False, below.right, below.left),
        ):
            types = (
                MorselJoinStageExec.HOST_LEFT_TYPES
                if host_on_left
                else MorselJoinStageExec.HOST_RIGHT_TYPES
            )
            if below.join_type not in types:
                continue
            hchain, hbelow = _fusable_chain(child)
            if hchain is None:
                hchain, hbelow = [], child
            if not isinstance(hbelow, HostMemoryExec):
                continue
            if not all(
                isinstance(op, (FilterExec, ProjectionExec)) for op in hchain
            ):
                continue
            return MorselJoinStageExec(
                chain, below, hchain, hbelow, host_on_left,
                self._opt(other, False), root=is_root,
            )
        return None

    def _opt(self, plan: ExecutionPlan, is_root: bool) -> ExecutionPlan:
        # host-resident (out-of-HBM) sources stream morsels through the
        # fused stage instead of materializing; must be checked before the
        # StageExec path (HostMemoryExec IS a MemoryExec, and StageExec
        # would materialize the whole table on device)
        from ..datasource.host import HostMemoryExec
        from .morsel import MorselStageExec

        mchain, mbelow = _fusable_chain(plan)
        if (
            mchain is not None
            and isinstance(mbelow, HostMemoryExec)
            and not any(isinstance(op, WindowAggExec) for op in mchain)
        ):
            return MorselStageExec(mchain, mbelow, root=is_root)
        mj = self._try_morsel_join(plan, is_root)
        if mj is not None:
            return mj
        if compilable(plan) and _worth_fusing(plan):
            return StageExec(plan, root=is_root)
        # tail fusion: a fusable prefix above a non-fusable input (join,
        # union, ...) still becomes one program — including bare
        # projection/filter chains: eager expression evaluation dispatches
        # one device program per jnp op, and dispatch latency (~28 ms
        # through the TPU tunnel) dominates mid-plan glue (the q18 profile
        # showed 173 ms for a 4-column projection, bench/PROFILE_SF1.md)
        chain, below = _fusable_chain(plan)
        if chain is not None:
            inner = self._opt(below, False)
            rebuilt = inner
            for op in reversed(chain):
                rebuilt = op.with_new_children([rebuilt])
            return TailStageExec(rebuilt, inner, root=is_root)
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
