"""SPMD plan executor: lowers ANY physical plan onto a jax.sharding.Mesh.

This is the TPU-native analogue of Ballista's DistributedPlanner + executor
fleet (/root/reference/ballista/rust/scheduler/src/planner.rs:40-171, which
stage-splits arbitrary operator trees, and executor/src/execution_loop.rs:39,
which runs any plan): every relational operator the single-device engine
plans can execute over the mesh.

Strategy per node:

- scans / leaves             load once on host, round-robin shard (the
                             reference's RoundRobinBatch repartition)
- Filter / Projection        shard-local (dist_filter / dist_project)
- HashAggregate (single)     dist_aggregate: partial -> all_to_all re-key
                             by group hash -> final (planner.rs:526-601);
                             global DISTINCT places rows by the hash of
                             the DISTINCT argument first (local dedup
                             becomes global), grouped DISTINCT uses
                             dist_aggregate_exact row placement
- HashJoin (all SIX types)   dist_join: all_to_all both sides by key hash,
                             local six-type join (hash_join.rs:139-144
                             PartitionMode::Partitioned); small build sides
                             (<= DFTPU_BCAST_ROWS) auto-select broadcast
                             mode (CollectLeft, hash_join.rs:285) — build
                             replicated via all_gather, probes stay local;
                             hot keys auto-select the skew-aware hybrid
                             (observed exchange overflow escalates inside
                             dist_join — the statistics-driven join-mode
                             planning of planner.rs:753-851, derived from
                             the data itself); MergeJoin lowers through
                             the same path
- Sort [+ fetch]             dist_sort: sample-based range partition +
                             all_to_all + local sort (TeraSort-style; the
                             reference coalesces to 1 partition instead);
                             fetch composes dist_limit on the range-sorted
                             shards, so TopK moves <= fetch rows total
- WindowAgg (PARTITION BY)   dist_window: all_to_all by partition-key hash
                             (whole partitions co-locate), local traced
                             window per shard; no-PARTITION BY windows
                             range-partition by ORDER BY + O(ndev)
                             collective corrections (dist_window_global);
                             explicit frames / mixed ORDER BY gather
- Union                      shard-wise concatenation
- GlobalLimit / Skip         prefix-count truncation per shard (one
                             all_gather of counts; LIMIT moves no data)
- everything else            gather -> single-device operator -> re-shard
                             (the reference's CoalescePartitionsExec
                             equivalent for single-partition-required ops)

Observability contract: ``node_modes`` records (operator, mode) per plan
node — mode "mesh"/"broadcast" (distributed), "gather" (structurally
single-partition, the CoalescePartitions analogue), or "fallback:<error>"
(a distributed implementation FAILED and the engine degraded to
gather-and-run-local).  ``strict=True`` (or DFTPU_SPMD_STRICT=1) turns
error fallbacks into raises so CI catches regressions instead of silently
losing mesh-native execution.  Only ExecutionError is ever converted into
a fallback; real runtime/compile errors always propagate.
"""

from __future__ import annotations

import os

import numpy as np

from ..columnar.table import Table, round_capacity
from ..errors import ExecutionError
from ..ops.aggregate import HashAggregateExec
from ..ops.base import ExecutionPlan
from ..ops.basic import (
    FilterExec,
    GlobalLimitExec,
    MemoryExec,
    ProjectionExec,
    SkipExec,
    UnionExec,
)
from ..ops.join import HashJoinExec
from ..ops.sorted import MergeJoinExec
from ..ops.sort import SortExec
from ..ops.window import WindowAggExec
from .mesh import ShardedTable, make_mesh
from .ops import dist_aggregate, dist_filter, dist_join, dist_project, dist_sort


class SpmdExecutor:
    """Executes a physical plan over a device mesh.

    ``execute_plan`` returns a gathered single-device Table (the
    collect() contract); ``execute_sharded`` returns the ShardedTable for
    callers composing further mesh work.
    """

    def __init__(self, mesh=None, n_devices: int | None = None,
                 strict: bool | None = None, analyze: bool = False):
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        if strict is None:
            strict = bool(os.environ.get("DFTPU_SPMD_STRICT"))
        self.strict = strict
        # analyze=True additionally records live output-row counts per node
        # (one tiny count fetch each — EXPLAIN ANALYZE only, not the hot path)
        self.analyze = analyze
        # (operator name, mode) per executed node; see module docstring
        self.node_modes: list[tuple[str, str]] = []
        # richer per-node record: exchange buckets/capacities/bytes/retries
        # (the repartition.rs:58-100 / shuffle_writer.rs:260-300 analogue)
        self.node_details: list[dict] = []

    @property
    def fallback_count(self) -> int:
        """Error-driven fallbacks (a dist op failed). 0 on a healthy mesh."""
        return sum(1 for _, m in self.node_modes if m.startswith("fallback"))

    @property
    def gather_count(self) -> int:
        """Structural gathers (single-partition-required operators)."""
        return sum(1 for _, m in self.node_modes if m == "gather")

    # ------------------------------------------------------------------
    def execute_plan(self, plan: ExecutionPlan) -> Table:
        out = self._exec(plan)
        return out.to_table() if isinstance(out, ShardedTable) else out

    def execute_sharded(self, plan: ExecutionPlan) -> ShardedTable:
        out = self._exec(plan)
        if isinstance(out, ShardedTable):
            return out
        return ShardedTable.from_table(out, self.mesh)

    # ------------------------------------------------------------------
    def _note(self, plan, mode: str, out: "ShardedTable | None" = None):
        self.node_modes.append((type(plan).__name__, mode))
        d = {"op": type(plan).__name__, "mode": mode}
        if isinstance(out, ShardedTable):
            d["shard_cap"] = out.shard_cap
            info = dict(getattr(out, "exchange_info", {}))
            if "op" in info:
                info["impl"] = info.pop("op")
            if "mode" in info:
                info["strategy"] = info.pop("mode")
            d.update(info)
            if self.analyze:
                d["output_rows"] = out.total_rows()
                counts = np.asarray(out.nrows, dtype=float)
                mean = counts.sum() / max(len(counts), 1)
                d["shard_balance"] = (
                    round(float(counts.max()) / mean, 2) if mean else 1.0
                )
        self.node_details.append(d)

    def explain_rows(self) -> str:
        """One line per executed node for mesh EXPLAIN [ANALYZE]."""
        lines = []
        for d in self.node_details:
            parts = [f"{d['op']} [{d['mode']}]"]
            for key in (
                "impl", "strategy", "output_rows", "shard_balance", "shard_cap", "bucket_cap",
                "recv_cap", "pair_cap", "retries", "exchange_bytes",
            ):
                if key in d:
                    parts.append(f"{key}={d[key]}")
            lines.append(" ".join(parts))
        return "\n".join(lines)

    def _failed(self, plan: ExecutionPlan, err: Exception, child_results):
        """A distributed implementation raised ExecutionError: in strict
        mode that is a hard failure; otherwise degrade to gather-and-run-
        local, recording the degradation for EXPLAIN/CI."""
        if self.strict:
            raise ExecutionError(
                f"strict SPMD: {type(plan).__name__} failed to lower onto "
                f"the mesh: {err}"
            ) from err
        self._note(plan, f"fallback:{err}")
        return self._gather_run(plan, child_results)

    def _exec(self, plan: ExecutionPlan) -> ShardedTable:
        if isinstance(plan, FilterExec):
            st = self._exec(plan.input)
            try:
                out = dist_filter(st, plan.predicate).shrink()
            except ExecutionError as e:
                return self._failed(plan, e, [st])
            self._note(plan, "mesh", out)
            return out
        if isinstance(plan, ProjectionExec):
            st = self._exec(plan.input)
            try:
                out = dist_project(st, plan.exprs)
            except ExecutionError as e:
                return self._failed(plan, e, [st])
            self._note(plan, "mesh", out)
            return out
        if isinstance(plan, HashAggregateExec) and plan.mode == "single":
            st = self._exec(plan.input)
            if any(a.distinct for a in plan.aggr_expr):
                if not plan.group_expr:
                    # global DISTINCT: dist_aggregate pre-places rows by
                    # the hash of the DISTINCT argument (disjoint value
                    # sets per shard -> local dedup is global).  Mixed
                    # distinct arguments have no single placement — that
                    # is a STRUCTURAL gather, not a failure
                    dargs = {
                        str(a.expr)
                        for a in plan.aggr_expr
                        if a.distinct
                    }
                    if len(dargs) != 1 or any(
                        a.distinct and a.expr is None
                        for a in plan.aggr_expr
                    ):
                        self._note(plan, "gather")
                        return self._gather_run(plan, [st])
                    try:
                        out = dist_aggregate(
                            st, plan.group_expr, plan.aggr_expr
                        ).shrink()
                    except ExecutionError as e:
                        return self._failed(plan, e, [st])
                    self._note(plan, "mesh", out)
                    return out
                # DISTINCT needs the global value set per group: hash-PLACE
                # raw rows so each group lands whole on one shard, then the
                # exact single-device aggregate runs per shard
                from .ops import dist_aggregate_exact

                try:
                    out, ovf = dist_aggregate_exact(st, plan)
                    if ovf > 0:
                        raise ExecutionError(
                            "dist_aggregate_exact: bucket overflow persists"
                        )
                except ExecutionError as e:
                    return self._failed(plan, e, [st])
                out = out.shrink()
                self._note(plan, "mesh", out)
                return out
            try:
                out = dist_aggregate(st, plan.group_expr, plan.aggr_expr).shrink()
            except ExecutionError as e:
                return self._failed(plan, e, [st])
            self._note(plan, "mesh", out)
            return out
        if isinstance(plan, (HashJoinExec, MergeJoinExec)):
            # MergeJoinExec shares the equi-join contract (on/join_type);
            # its sorted-input hint has no distributed analogue here, so it
            # lowers to the same partitioned/broadcast join
            sl = self._exec(plan.left)
            sr = self._exec(plan.right)
            # CollectLeft mode for small build sides (hash_join.rs:285):
            # replicate the build via all_gather, probes stay local — no
            # all_to_all of the big side at all.  The decision reads only
            # the build side's STATIC capacity bound (ndev * shard_cap >=
            # rows, tight after shrink) — zero host syncs at lowering
            # time, the planner.rs:753-851 statistics decision made from
            # shape metadata instead of a D2H row count.
            limit = int(os.environ.get("DFTPU_BCAST_ROWS", 1 << 16))
            bcast = sr.ndev * sr.shard_cap <= limit
            try:
                # shrink: join output capacity (fanout * probe cap) and
                # shuffle receive buffers otherwise COMPOUND up the plan
                out = dist_join(
                    sl, sr, plan.on, plan.join_type,
                    getattr(plan, "filter", None),
                    broadcast=bcast,
                ).shrink()
            except ExecutionError as e:
                return self._failed(plan, e, [sl, sr])
            self._note(plan, "broadcast" if bcast else "mesh", out)
            return out
        if isinstance(plan, SortExec):
            st = self._exec(plan.input)
            try:
                out, ovf = dist_sort(st, plan.sort_exprs)
                if ovf > 0:
                    raise ExecutionError("dist_sort: bucket overflow persists")
            except ExecutionError as e:
                return self._failed(plan, e, [st])
            self._note(plan, "mesh", out)
            if plan.fetch is not None:
                # TopK: rows are globally ordered across shards, so the
                # first `fetch` rows are each shard's prefix — dist_limit
                # truncates per-shard counts (zero data movement) and the
                # shrink right-sizes capacity, so the eventual gather moves
                # <= fetch rows instead of the whole sorted table
                from .ops import dist_limit

                return dist_limit(out, plan.fetch).shrink()
            return out.shrink()
        if isinstance(plan, WindowAggExec):
            st = self._exec(plan.input)
            pkeys = [
                tuple(str(p) for p in w.partition_by)
                for w in plan.window_exprs
            ]
            if not any(pkeys):
                # no PARTITION BY anywhere: the reference pins this to a
                # single partition (windows/window_agg_exec.rs); we range-
                # partition by the ORDER BY instead (ties co-locate) and
                # apply O(ndev) collective corrections.  Structurally
                # ineligible shapes (explicit frames, mixed ORDER BY,
                # non-static lag offsets) gather like the reference.
                from .ops import dist_window_global, global_window_eligible

                if not global_window_eligible(plan.window_exprs):
                    self._note(plan, "gather")
                    return self._gather_run(plan, [st])
                try:
                    out, ovf = dist_window_global(st, plan.window_exprs)
                    if ovf < 0:
                        # RANGE-frame value window wider than the halo (or
                        # null order keys): a data condition, so degrade
                        # to the gather even in strict mode
                        self._note(plan, "gather")
                        return self._gather_run(plan, [st])
                    if ovf > 0:
                        raise ExecutionError(
                            "dist_window_global: range overflow persists"
                        )
                except ExecutionError as e:
                    return self._failed(plan, e, [st])
                out = out.shrink()
                self._note(plan, "mesh", out)
                return out
            if not all(pkeys) or len(set(pkeys)) != 1:
                # mixed PARTITION BY keys in one node (hash placement can
                # only co-locate one partitioning): gather
                self._note(plan, "gather")
                return self._gather_run(plan, [st])
            from .ops import dist_window

            try:
                out, ovf = dist_window(st, plan.window_exprs)
                if ovf > 0:
                    raise ExecutionError("dist_window: bucket overflow persists")
            except ExecutionError as e:
                return self._failed(plan, e, [st])
            out = out.shrink()
            self._note(plan, "mesh", out)
            return out
        if isinstance(plan, UnionExec):
            parts = [self._exec(c) for c in plan.children()]
            from .ops import dist_union

            try:
                out = dist_union(parts, plan.schema()).shrink()
            except ExecutionError as e:
                return self._failed(plan, e, parts)
            self._note(plan, "mesh", out)
            return out
        if isinstance(plan, (GlobalLimitExec, SkipExec)):
            st = self._exec(plan.children()[0])
            from .ops import dist_limit, dist_skip

            try:
                if isinstance(plan, GlobalLimitExec):
                    out = dist_limit(st, plan.n)
                else:
                    out = dist_skip(st, plan.n)
            except ExecutionError as e:
                return self._failed(plan, e, [st])
            self._note(plan, "mesh", out)
            return out
        if not plan.children():
            from ..datasource.host import HostMemoryExec

            if isinstance(plan, HostMemoryExec):
                # out-of-HBM scan: shard the host table straight onto the
                # mesh — each device receives only its N/ndev slice and
                # the table NEVER materializes on a single device
                out = ShardedTable.from_host(
                    plan.projected_host(), self.mesh
                )
                self._note(plan, "mesh", out)
                return out
            # leaf: scan executes on host/single device, then shards
            self._note(plan, "mesh")
            return ShardedTable.from_table(plan.execute(), self.mesh)
        self._note(plan, "gather")
        return self._gather_run(plan, [self._exec(c) for c in plan.children()])

    # ------------------------------------------------------------------
    def _gather_run(self, plan: ExecutionPlan, child_results) -> ShardedTable:
        """Gather children to single-device Tables and run the operator's
        single-device implementation (required-single-distribution ops and
        not-yet-distributed operators) — the CoalescePartitionsExec
        equivalent (physical_optimizer/merge_exec.rs)."""
        tables = [
            c.to_table() if isinstance(c, ShardedTable) else c
            for c in child_results
        ]
        children = plan.children()
        subs = [
            MemoryExec(t, c.schema()) for t, c in zip(tables, children)
        ]
        node = plan.with_new_children(subs) if children else plan
        out = node.execute()
        return ShardedTable.from_table(out, self.mesh)
