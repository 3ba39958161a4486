"""ExecutionPlan: the physical operator contract.

Equivalent of the reference's ExecutionPlan trait
(/root/reference/datafusion/src/physical_plan/mod.rs:152-197) with the key
TPU-native difference (SURVEY.md §7): instead of per-partition async
RecordBatch streams pulled by Tokio tasks, execute() transforms ONE
device-resident Table per call.  Partition parallelism maps to SPMD mesh
sharding (datafusion_tpu/parallel), not to operator-level streams, so the
single-device contract stays synchronous and whole-table.

Per-operator metrics mirror SQLMetric (mod.rs:59-122).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

import numpy as np

from ..columnar.table import Table
from ..types import Schema

# Per-operator device drain for truthful device-time attribution in the
# profiler (bench/profile_q --block sets this).  Off in production: it
# serializes dispatch with compute and adds one D2H per column per op.
PROFILE_BLOCKING = False


@dataclass
class SQLMetric:
    """Counter or nanosecond timer (reference physical_plan/mod.rs:59-122)."""

    name: str
    value: int = 0
    is_time: bool = False

    def add(self, n: int):
        self.value += n


class MetricsSet:
    def __init__(self):
        self._metrics: dict[str, SQLMetric] = {}

    def counter(self, name: str) -> SQLMetric:
        if name not in self._metrics:
            self._metrics[name] = SQLMetric(name)
        return self._metrics[name]

    def timer(self, name: str) -> SQLMetric:
        if name not in self._metrics:
            self._metrics[name] = SQLMetric(name, is_time=True)
        return self._metrics[name]

    def items(self):
        return self._metrics.items()


# per-thread execution scope: top-level execute() calls open a new epoch
# (shared-subtree memos are valid only within one epoch)
_EXEC_STATE = threading.local()


class ExecutionPlan:
    """Base physical operator."""

    def __init__(self):
        self.metrics = MetricsSet()

    def schema(self) -> Schema:
        raise NotImplementedError

    def children(self) -> list["ExecutionPlan"]:
        return []

    def with_new_children(self, children: list["ExecutionPlan"]) -> "ExecutionPlan":
        raise NotImplementedError

    def execute(self) -> Table:
        """Run this operator (and its inputs) to completion on this device.

        A node marked by DeduplicateSubtrees (physical/dedup.py) as shared
        memoizes its result for the duration of one top-level execution: a
        view/CTE referenced twice runs once.  The epoch bumps whenever a
        new top-level execute() begins (depth 0), so repeated runs of the
        same plan object — warm benchmarks, speculative-overflow exact
        reruns — never see a stale memo."""
        st = _EXEC_STATE
        depth = getattr(st, "depth", 0)
        if depth == 0:
            st.epoch = getattr(st, "epoch", 0) + 1
        if getattr(self, "_dedup_shared", False):
            memo = getattr(self, "_dedup_memo", None)
            if memo is not None and memo[0] == getattr(st, "epoch", 0):
                return memo[1]
        st.depth = depth + 1
        try:
            t0 = time.perf_counter_ns()
            out = self._execute()
            if PROFILE_BLOCKING:
                # attribute DEVICE time to this operator: async dispatch
                # makes host-side elapsed meaningless, so profiling mode
                # drains the device after every operator (distorts
                # end-to-end wall-clock; enabled only by bench/profile_q).
                # tiny D2H per column, not block_until_ready: the remote-TPU
                # tunnel only synchronizes on a real transfer
                for c in out.columns:
                    np.asarray(c.data[0:1])
            self.metrics.timer("elapsed_ns").add(time.perf_counter_ns() - t0)
        finally:
            st.depth = depth
        # record the table, not out.nrows: reading nrows here would force a
        # device sync per operator (Table keeps lazy device-resident counts);
        # collect_plan_metrics materializes on harvest.  Skipped during a
        # whole-query trace — a tracer table must not leak into the
        # harvest path (query_compiler.py).
        from ..physical import query_compiler as _QC

        if not _QC.active():
            self._metrics_out = out
        if getattr(self, "_dedup_shared", False):
            self._dedup_memo = (st.epoch, out)
        return out

    def _execute(self) -> Table:
        raise NotImplementedError

    # ---- hints for the planner/optimizer (OptimizerHints, mod.rs:129-139) --
    def output_sort_order(self) -> list | None:
        """[(column_index, ascending, nulls_first), ...] when this operator
        guarantees its output row order, else None.  Consumed by
        SortedAggregateRule / EliminateRedundantSort (the fork's
        compute_aggregation_strategy + OptimizerHints machinery)."""
        return None

    # ---- display -------------------------------------------------------------
    def display(self, indent: int = 0) -> str:
        pad = "  " * indent
        s = pad + self._display_line()
        for c in self.children():
            s += "\n" + c.display(indent + 1)
        return s

    def _display_line(self) -> str:
        return type(self).__name__

    def __repr__(self):
        return self.display()


def collect_plan_metrics(plan: ExecutionPlan, out=None) -> dict:
    """Harvest metrics from a plan tree (plan_metrics, mod.rs:322)."""
    out = out if out is not None else {}
    key = type(plan).__name__
    mo = getattr(plan, "_metrics_out", None)
    if mo is not None:
        plan.metrics.counter("output_rows").add(mo.nrows)
        plan._metrics_out = None
    for name, m in plan.metrics.items():
        out.setdefault(f"{key}.{name}", 0)
        out[f"{key}.{name}"] += m.value
    for c in plan.children():
        collect_plan_metrics(c, out)
    return out
