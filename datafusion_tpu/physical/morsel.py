"""Morsel-streamed fused stages: run a scan-rooted stage per host morsel.

The reference streams batches through operators so no table ever needs to
be memory-resident (parquet.rs:596-636 blocking-reader partitions,
hash_aggregate.rs partial accumulation).  Here the unit is a MORSEL — a
fixed-capacity device slice of a host-resident table — and the fused
stage program is compiled ONCE for the morsel shape:

  per morsel:  filters/projections (+ AGGREGATE in 'partial' mode)
  merge:       concat morsel outputs -> 'final' aggregate over states
  finish:      remaining chain ops (projections / sort / limit)

Aggregation thus re-uses the same partial->final machinery the
distributed planner uses across chips (planner.rs:526-601's two-phase
split), applied across morsels of one chip — states, not raw rows, are
what accumulates in HBM.
"""

from __future__ import annotations

from ..columnar.column import Column
from ..columnar.table import Table
from ..datasource.host import HostMemoryExec, HostTable
from ..errors import InternalError
from ..exprs.physical import PhysCol
from ..ops.aggregate import HashAggregateExec
from ..ops.base import ExecutionPlan
from ..ops.basic import FilterExec, GlobalLimitExec, MemoryExec, ProjectionExec, concat_tables
from ..ops.join import HashJoinExec
from ..ops.sort import SortExec
from .stage_compiler import CompiledStage


class _MorselSource(ExecutionPlan):
    """Placeholder stage source: morsels are passed via src= at execute."""

    def __init__(self, schema):
        super().__init__()
        self._schema = schema

    def schema(self):
        return self._schema

    def children(self):
        return []

    def with_new_children(self, c):
        return self

    def _execute(self) -> Table:
        raise InternalError("_MorselSource executes only via src= morsels")


class MorselStageExec(ExecutionPlan):
    """A fusable chain over a HostMemoryExec source, executed morsel-wise.

    ``chain`` is top-to-bottom: [Limit?, Sort?, Proj*, Agg?, Filter/Proj*]
    (the _fusable_chain grammar).  Everything below (and including) the
    aggregate runs per morsel; the final aggregate + ops above it run once
    on the merged states."""

    def __init__(self, chain: list, source: HostMemoryExec, root: bool = False):
        super().__init__()
        self.full_chain = list(chain)
        self.source = source
        self.root = root
        self.host: HostTable = source.projected_host()

        # split the chain at the aggregate
        agg_idx = next(
            (
                i
                for i, op in enumerate(chain)
                if isinstance(op, HashAggregateExec)
            ),
            None,
        )
        if agg_idx is not None:
            self.agg: HashAggregateExec | None = chain[agg_idx]
            if self.agg.mode != "single":
                raise InternalError("morsel stage expects a 'single' aggregate")
            self.above = chain[:agg_idx]  # Limit? Sort? Proj*
            below = chain[agg_idx + 1 :]  # Filter/Proj*
        else:
            self.agg = None
            # without an aggregate everything except Sort/Limit runs
            # per-morsel; Sort/Limit merge on the concatenated result
            self.above = [
                op for op in chain if isinstance(op, (SortExec, GlobalLimitExec))
            ]
            below = [
                op
                for op in chain
                if not isinstance(op, (SortExec, GlobalLimitExec))
            ]

        # per-morsel plan over the placeholder source
        src_schema = self.host.schema()
        placeholder = _MorselSource(src_schema)
        per: ExecutionPlan = placeholder
        for op in reversed(below):
            per = op.with_new_children([per])
        per, self._distinct_values = _attach_partial_agg(self.agg, per)
        self.per_morsel_plan = per
        self.stage = CompiledStage(per, source_node=placeholder)

    # ------------------------------------------------------------------
    def schema(self):
        return self.full_chain[0].schema()

    def children(self):
        return []

    def with_new_children(self, c):
        return self

    def _display_line(self):
        r = " root" if self.root else ""
        return (
            f"MorselStageExec[fused x{len(self.full_chain)}{r}, "
            f"{self.host.num_morsels} morsels x {self.host.morsel_rows}]"
        )

    # ------------------------------------------------------------------
    def _execute(self) -> Table:
        host = self.host
        m = host.num_morsels
        outs: list[Table] = []
        nxt = host.morsel(0)
        for i in range(m):
            cur = nxt
            if i + 1 < m:
                # issue the next H2D upload BEFORE consuming this morsel's
                # outputs: jax dispatch is async, so the transfer rides
                # under the current morsel's compute (double buffering)
                nxt = host.morsel(i + 1)
            outs.append(self.stage.execute(shrink=True, src=cur))

        return _merge_and_finish(
            outs,
            self.per_morsel_plan.schema(),
            self.agg,
            self._distinct_values,
            self.above,
            owner=self,
        )


def _attach_partial_agg(agg, per):
    """Wrap the per-morsel plan in a 'partial' aggregate (distinct-correct:
    partial groups by (keys + distinct values) so morsels emit dedup'd
    pairs, not over-countable states).  Returns (plan, distinct_values)."""
    if agg is None:
        return per, 0
    if any(a.distinct for a in agg.aggr_expr):
        distinct_aggs = [a for a in agg.aggr_expr if a.distinct]
        pgroup = list(agg.group_expr) + [
            (a.expr, f"__dv{i}") for i, a in enumerate(distinct_aggs)
        ]
        paggs = [a for a in agg.aggr_expr if not a.distinct]
        return HashAggregateExec("partial", pgroup, paggs, per), len(distinct_aggs)
    return HashAggregateExec("partial", agg.group_expr, agg.aggr_expr, per), 0


def _merge_and_finish(outs, pschema, agg, distinct_values, above, owner=None):
    """Concat per-morsel outputs, run the 'final' aggregate over the merged
    states, then the above-chain ops (Limit? Sort? Proj*).

    ``owner`` (the morsel stage) caches the finisher plan across
    executions: rebuilding the final HashAggregateExec per run used to
    discard its jit cache and re-trace the merge program every warm
    iteration."""
    merged = outs[0] if len(outs) == 1 else concat_tables(outs, pschema)
    fin = getattr(owner, "_finisher", None) if owner is not None else None
    if fin is None:
        swap = _SwapSource(pschema)
        node: ExecutionPlan = swap
        if agg is not None:
            final_group = [
                (PhysCol(pschema.fields[i].name, i, pschema.fields[i].dtype), name)
                for i, (_, name) in enumerate(agg.group_expr)
            ]
            node = HashAggregateExec(
                "final", final_group, agg.aggr_expr, node,
                distinct_values=distinct_values,
            )
        for op in reversed(above):
            node = op.with_new_children([node])
        fin = (swap, node)
        if owner is not None:
            owner._finisher = fin
    swap, node = fin
    swap.table = merged
    try:
        return node.execute()
    finally:
        swap.table = None


class _SwapSource(ExecutionPlan):
    """Mutable morsel slot: the SAME per-morsel operator tree (and its jit
    caches) is reused across morsels by swapping .table."""

    def __init__(self, schema):
        super().__init__()
        self._schema = schema
        self.table: Table | None = None

    def schema(self):
        return self._schema

    def children(self):
        return []

    def with_new_children(self, c):
        return self

    def _execute(self) -> Table:
        if self.table is None:
            raise InternalError("_SwapSource executes only inside a morsel loop")
        return self.table


class MorselJoinStageExec(ExecutionPlan):
    """Streamed hash join over a host-resident probe side (SURVEY §7 hard
    part (g), the reference's pipelined streaming join: hash_join.rs probes
    arrive batch-by-batch against a collected build side).

    The build side executes ONCE and stays HBM-resident; host probe morsels
    stream through [probe-chain -> join -> mid-chain -> partial agg], states
    accumulate, and the final aggregate + above-chain run on the merge.
    Host-side row decisions are sound per morsel (each host row appears in
    exactly one morsel with the whole build side present): host-on-left
    inner/left/semi/anti, host-on-right inner/right stream directly.
    DEVICE-side outer rows (right/full with host-left; left/full with
    host-right) stream too, via a __rowid column riding the build side: a
    visited mask accumulates across morsels and one final unmatched batch
    (build rows padded with nulls) feeds the same mid-chain + partial
    aggregate — the reference's visited bitmap (hash_join.rs :649) carried
    across the probe stream."""

    HOST_LEFT_TYPES = ("inner", "left", "semi", "anti", "right", "full")
    HOST_RIGHT_TYPES = ("inner", "right", "left", "full")

    def __init__(self, chain, join, host_chain, host_source, host_on_left,
                 build, root=False):
        super().__init__()
        self.full_chain = list(chain)
        self.join = join
        self.host_chain = list(host_chain)
        self.source = host_source
        self.host_on_left = host_on_left
        self.build = build
        self.root = root
        self.host: HostTable = host_source.projected_host()

        agg_idx = next(
            (i for i, op in enumerate(chain)
             if isinstance(op, HashAggregateExec)),
            None,
        )
        if agg_idx is not None:
            self.agg = chain[agg_idx]
            if self.agg.mode != "single":
                raise InternalError("morsel join stage expects a 'single' aggregate")
            self.above = chain[:agg_idx]
            self.mid = chain[agg_idx + 1:]          # Filter/Proj above the join
        else:
            self.agg = None
            self.above = [
                op for op in chain if isinstance(op, (SortExec, GlobalLimitExec))
            ]
            self.mid = [
                op for op in chain
                if not isinstance(op, (SortExec, GlobalLimitExec))
            ]

    def schema(self):
        return (self.full_chain[0] if self.full_chain else self.join).schema()

    def children(self):
        return [self.build]

    def with_new_children(self, c):
        return MorselJoinStageExec(
            self.full_chain, self.join, self.host_chain, self.source,
            self.host_on_left, c[0], self.root,
        )

    def _display_line(self):
        r = " root" if self.root else ""
        side = "left" if self.host_on_left else "right"
        return (
            f"MorselJoinStageExec[{self.join.join_type}, host-{side}, "
            f"fused x{len(self.full_chain) + 1 + len(self.host_chain)}{r}, "
            f"{self.host.num_morsels} morsels x {self.host.morsel_rows}]"
        )

    # ------------------------------------------------------------------
    def _execute(self) -> Table:
        import jax.numpy as jnp

        from ..ops import kernels as K
        from ..types.dtypes import INT64

        jt = self.join.join_type
        device_outer = (
            jt in ("right", "full") if self.host_on_left
            else jt in ("left", "full")
        )
        build_tbl = self.build.execute()
        # the build side is reused across every probe morsel: the join
        # layer hashes + sorts it ONCE (ops/join.py _join_prep) so
        # per-morsel work scales with the morsel, not the build
        build_tbl._reused_build = True
        jschema = self.join.schema()
        nfields = len(jschema.fields)
        nb = len(build_tbl.columns)
        nh = nfields - nb

        if not device_outer:
            bmem = MemoryExec(build_tbl, self.build.schema())
            per_join = self.join
            rowid_idx = None
        else:
            # ride a __rowid column on the build side; per-morsel join type
            # keeps only host-side outer semantics, device-side unmatched
            # rows are emitted once at the end from the visited mask
            rcap = build_tbl.capacity
            rowid = Column(
                INT64, jnp.arange(rcap, dtype=jnp.int64),
                jnp.ones(rcap, bool),
            )
            btbl2 = Table(
                list(build_tbl.names) + ["__rowid"],
                list(build_tbl.columns) + [rowid],
                build_tbl.nrows_dev,
            )
            btbl2._reused_build = True
            bmem = MemoryExec(btbl2, btbl2.schema())
            per_jt = {"right": "inner", "full": "left"}[jt] if self.host_on_left \
                else {"left": "inner", "full": "right"}[jt]
            per_filter = self.join.filter
            if per_filter is not None and not self.host_on_left:
                # __rowid sits between the build and host columns; shift
                # the residual filter's host-side column indices past it
                import copy

                from ..exprs.physical import PhysCol as _PC

                per_filter = copy.deepcopy(per_filter)

                def _shift(e):
                    if isinstance(e, _PC) and e.index >= nb:
                        e.index += 1
                    for c in e.children():
                        _shift(c)

                _shift(per_filter)
            per_join = HashJoinExec(
                self.join.left, self.join.right, self.join.on, per_jt,
                per_filter,
            )
            # __rowid is the LAST build column: last overall for host-left,
            # at index nb (before the host cols) for host-right
            rowid_idx = nfields if self.host_on_left else nb

        swap = _SwapSource(self.host.schema())
        probe: ExecutionPlan = swap
        for op in reversed(self.host_chain):
            probe = op.with_new_children([probe])
        kids = [probe, bmem] if self.host_on_left else [bmem, probe]
        join_node = per_join.with_new_children(kids)

        # downstream tree over the ORIGINAL join output schema (a second
        # swap source: per-morsel join outputs AND the final unmatched
        # batch both feed it).  Cached across executions — the partial
        # aggregate's per-instance jit cache must survive warm runs, or
        # every iteration re-traces the morsel merge program.
        cached = getattr(self, "_per_cache", None)
        if cached is None:
            swap2 = _SwapSource(jschema)
            node: ExecutionPlan = swap2
            for op in reversed(self.mid):
                node = op.with_new_children([node])
            per, distinct_values = _attach_partial_agg(self.agg, node)
            self._per_cache = (swap2, per, distinct_values)
        swap2, per, distinct_values = self._per_cache

        visited = None
        out_dics = None

        host = self.host
        m = host.num_morsels
        outs: list[Table] = []
        nxt = host.morsel(0)
        for i in range(m):
            cur = nxt
            if i + 1 < m:
                # prefetch rides under this morsel's compute (async dispatch)
                nxt = host.morsel(i + 1)
            swap.table = cur
            jt_out = join_node.execute()
            if device_outer:
                rid = jt_out.columns[rowid_idx]
                live = jnp.arange(jt_out.capacity) < jt_out.nrows_dev
                # bookkeeping scatter, one per morsel (not a hot-path op)
                idx = jnp.where(rid.valid & live, rid.data, rcap).astype(
                    jnp.int32
                )
                upd = jnp.zeros(rcap, bool).at[idx].set(True, mode="drop")
                visited = upd if visited is None else (visited | upd)
                cols = [
                    c for j, c in enumerate(jt_out.columns) if j != rowid_idx
                ]
                names = [
                    n for j, n in enumerate(jt_out.names) if j != rowid_idx
                ]
                if out_dics is None:
                    out_dics = [c.dictionary for c in cols]
                jt_out = Table(names, cols, jt_out.nrows_dev)
            swap2.table = jt_out
            outs.append(per.execute())

        if device_outer:
            # one final batch: unmatched build rows padded with nulls
            r_alive = jnp.arange(rcap) < build_tbl.nrows_dev
            keep = r_alive & ~visited
            hfields = (
                jschema.fields[:nh] if self.host_on_left
                else jschema.fields[nb:]
            )
            null_d = tuple(
                jnp.zeros(rcap, f.dtype.storage_np_dtype()) for f in hfields
            )
            null_v = tuple(jnp.zeros(rcap, bool) for _ in hfields)
            bd = tuple(c.data for c in build_tbl.columns)
            bv = tuple(c.valid & keep for c in build_tbl.columns)
            datas = null_d + bd if self.host_on_left else bd + null_d
            valids = null_v + bv if self.host_on_left else bv + null_v
            out_d, out_v, cnt = K.filter_compact(
                datas, valids, keep, build_tbl.nrows_dev
            )
            cols = [
                Column(f.dtype, d, v, dic)
                for f, dic, d, v in zip(jschema.fields, out_dics, out_d, out_v)
            ]
            swap2.table = Table([f.name for f in jschema.fields], cols, cnt)
            outs.append(per.execute())

        return _merge_and_finish(
            outs, per.schema(), self.agg, distinct_values, self.above,
            owner=self,
        )
