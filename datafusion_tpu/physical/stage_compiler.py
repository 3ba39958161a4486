"""Whole-stage compilation: fuse a linear operator chain into ONE jitted XLA
program.

The reference streams batches through per-operator async tasks; on TPU the
equivalent performance move is the opposite — trace the whole
Scan -> Filter/Projection -> Aggregate pipeline into a single XLA program so
the compiler fuses expression evaluation into the reductions and the host
dispatches once per stage (SURVEY.md §7: "a host-side Python driver walks
the physical plan and dispatches jitted stage functions").

TPU performance rules baked into this trace (measured on v5e; see
bench/MICRO.md):
  * NO scatters on the hot path.  A cap-sized scatter (compaction, or
    segment_sum with num_segments=cap) costs 0.5-0.8 s at 8M rows; the
    whole stage should run in ~10 ms.
  * Filters do NOT compact.  The predicate folds into a row-validity mask
    carried to the aggregate; elementwise work on dead lanes is free
    (VPU is bandwidth-bound).  Compaction happens at most ONCE, at stage
    exit, via stable argsort(~alive) + gather (5x cheaper than
    scatter-compact) — and not at all when the stage ends in an aggregate.
  * Small-domain GROUP BY (dictionary/bool keys, domain <= 256 — TPC-H
    Q1's returnflag x linestatus = 12) lowers to a fused [domain, N]
    masked broadcast-reduction per aggregate: XLA fuses the compare +
    select + reduce into a single pass over the column, so each aggregate
    costs one read of the data.  No sort, no scatter, MXU/VPU-friendly.
  * No-group aggregates are plain masked reductions.

Stage boundaries: joins and sorts with data-dependent output capacities
stay host-driven; everything between them fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table, round_capacity
from ..errors import InternalError, PlanError
from ..ops import kernels as K
from ..ops.aggregate import (
    HashAggregateExec,
    PhysAggExpr,
    _eval_aggregate,
    _group_rows,
    _merge_aggregate,
    _segment_first_index,
)
from ..ops.base import ExecutionPlan
from ..ops.basic import FilterExec, GlobalLimitExec, MemoryExec, ProjectionExec
from ..ops.sort import SortExec
from ..ops.window import WindowAggExec
from ..types.dtypes import FLOAT64, INT64

# domain limit for the fused [domain, N] reduction path; beyond this the
# [D, N] virtual compare grid gets compute-heavy and the sort path wins
FUSED_DOMAIN_LIMIT = 256


def node_exprs(node: ExecutionPlan):
    """The PhysicalExprs an operator evaluates (for jit-safety checks)."""
    if isinstance(node, FilterExec):
        return [node.predicate]
    if isinstance(node, ProjectionExec):
        return [e for e, _ in node.exprs]
    if isinstance(node, HashAggregateExec):
        return [e for e, _ in node.group_expr] + [
            a.expr for a in node.aggr_expr if a.expr is not None
        ]
    if isinstance(node, SortExec):
        return [s.expr for s in node.sort_exprs]
    if isinstance(node, WindowAggExec):
        out = []
        for w in node.window_exprs:
            out += list(w.args) + list(w.partition_by) + [s.expr for s in w.order_by]
        return out
    return []


def node_jit_safe(node: ExecutionPlan) -> bool:
    """False when any contained expression must read column data on the
    host (needs_host) — such operators cannot join a jitted fused stage."""
    return not any(e.needs_host() for e in node_exprs(node))


def compilable(plan: ExecutionPlan) -> bool:
    """Is this subtree one fusable stage?

    Shape: [Limit?] [Sort?] [Proj*] [Agg?] (Filter|Proj)* Memory — the whole
    query tail fuses so the host dispatches ONE XLA program per query
    (post-aggregate sort/projection run on the shrunk in-trace buffers)."""
    def _ok(n):
        # shared subtrees (physical/dedup.py) are stage boundaries; the
        # shared node itself may still head its own stage
        return n is plan or not getattr(n, "_dedup_shared", False)

    node = plan
    if isinstance(node, GlobalLimitExec) and _ok(node):
        node = node.input
    if isinstance(node, SortExec) and node_jit_safe(node) and _ok(node):
        node = node.input
    while isinstance(node, ProjectionExec) and node_jit_safe(node) and _ok(node):
        node = node.input
    if (
        isinstance(node, HashAggregateExec)
        and node.mode in ("single", "partial")
        and node_jit_safe(node)
        and _ok(node)
    ):
        node = node.input
    elif isinstance(node, WindowAggExec) and node_jit_safe(node) and _ok(node):
        node = node.input
    while isinstance(node, (FilterExec, ProjectionExec)) and node_jit_safe(node) and _ok(node):
        node = node.input
    return isinstance(node, MemoryExec) and not getattr(node, "_dedup_shared", False)


class CompiledStage:
    """One fused stage: fn(datas, valids, nrows) -> (datas, valids, nout).

    The stage source is either a MemoryExec leaf (scan-rooted stages) or an
    arbitrary subtree boundary (`source_node`, for query TAILS fused above
    joins — TailStageExec): for the latter the input table signature varies
    per execution, so jit variants and output dictionaries are cached per
    signature."""

    def __init__(self, plan: ExecutionPlan, source_node: ExecutionPlan | None = None):
        self.plan = plan
        # linearize
        chain = []
        node = plan
        while node is not source_node and not isinstance(node, MemoryExec):
            chain.append(node)
            node = node.children()[0]
        self.source = node
        self.dynamic = not isinstance(node, MemoryExec)
        self.chain = list(reversed(chain))
        self.out_schema = plan.schema()
        self._jit_variants: dict = {}
        # learned output capacities (plan-owned sources only), keyed by
        # input-table signature (() for scan-rooted stages): lets repeated
        # runs right-size without the count sync — see execute()
        self._learned_caps: dict = {}
        self._dict_cache: dict = {}
        if not self.dynamic:
            # learn output dictionaries from a dry evaluation
            self.out_dicts = self._infer_dicts(self.source.execute())
            # integer group keys that can use the fused small-domain path
            # when a cheap runtime min/max probe finds a small range: only
            # safe when the aggregate sees source columns directly
            self._probe_specs = self._find_probe_specs()
        else:
            self.out_dicts = None
            self._probe_specs = None  # probing costs host syncs; tails skip it
        self._probe_cache: dict = {}

    def _find_probe_specs(self):
        from ..exprs.physical import PhysCol

        agg = None
        below_ops = []
        for op in self.chain:
            if isinstance(op, HashAggregateExec):
                agg = op
                break
            below_ops.append(op)
        if agg is None or not agg.group_expr:
            return None
        if any(isinstance(op, ProjectionExec) for op in below_ops):
            return None
        specs = []
        for ki, (e, _) in enumerate(agg.group_expr):
            if not isinstance(e, PhysCol):
                continue
            if e.dtype.is_integer or e.dtype.kind == "date32":
                specs.append((ki, e.index))
        return specs or None

    def _probe_int_ranges(self, src: Table):
        """Eager min/max probe of integer group keys; small ranges unlock
        the fused [domain, N] path with the range as a static constant."""
        if not self._probe_specs:
            return None
        ckey = tuple(id(src.columns[ci].data) for _, ci in self._probe_specs)
        cached = self._probe_cache.get(ckey)
        if cached is not None:
            return cached or None
        ranges = {}
        alive = jnp.arange(src.capacity) < src.nrows
        for ki, ci in self._probe_specs:
            c = src.columns[ci]
            m = c.valid & alive
            big = jnp.iinfo(jnp.int64).max
            mn = int(jnp.min(jnp.where(m, c.data.astype(jnp.int64), big)))
            mx = int(jnp.max(jnp.where(m, c.data.astype(jnp.int64), -big)))
            if mn > mx:
                continue  # all-null key
            rng = mx - mn + 1
            if 0 < rng <= FUSED_DOMAIN_LIMIT:
                ranges[ki] = (mn, rng)
        # all int keys must be small for the fused path to engage
        if len(ranges) != len(self._probe_specs):
            ranges = {}
        self._probe_cache[ckey] = ranges
        if len(self._probe_cache) > 64:
            self._probe_cache.clear()
        return ranges or None

    # ------------------------------------------------------------------
    def execute(
        self,
        shrink: bool = True,
        src: Table | None = None,
        owned: bool | None = None,
        probe_src: Table | None = None,
    ) -> Table:
        # owned=True: src is this plan's own scan output passed explicitly
        # (StageExec under a cache hit) — capacity learning applies;
        # morsel-fed stages pass src without owned and keep per-call syncs.
        # probe_src: concrete table to run integer-range probes on when
        # src is a tracer view (whole-query trace).
        owned_source = owned if owned is not None else (src is None)
        if src is None:
            src = self.source.execute()
        datas = tuple(c.data for c in src.columns)
        valids = tuple(c.valid for c in src.columns)
        ranges = (
            self._probe_int_ranges(probe_src if probe_src is not None else src)
            if not self.dynamic
            else None
        )
        sig = (
            (src.capacity,
             tuple(str(c.dtype) for c in src.columns),
             tuple(id(c.dictionary) for c in src.columns),
             # the vrange-narrowing bit is baked into traced sort keys
             # (K.orderable_key via _table_view's vrange passthrough):
             # same-shaped inputs differing in range must not share a
             # narrowed program (ADVICE r4 #2)
             tuple(K.vrange_narrows_i32(c.vrange) for c in src.columns))
            if self.dynamic
            else ()
        )
        vkey = (tuple(sorted(ranges.items())) if ranges else (),) + sig
        fn = self._jit_variants.get(vkey)
        if fn is None:
            from functools import partial

            fn = jax.jit(partial(self._run, base=src, int_ranges=ranges))
            self._jit_variants[vkey] = fn
        out_dicts = self.out_dicts
        if out_dicts is None:
            out_dicts = self._dict_cache.get(sig)
            if out_dicts is None:
                out_dicts = self._infer_dicts(src)
                self._dict_cache[sig] = out_dicts
        out_d, out_v, nout = fn(datas, valids, src.nrows_dev)
        cols = [
            Column(f.dtype, d, v, dic)
            for f, d, v, dic in zip(self.out_schema.fields, out_d, out_v, out_dicts)
        ]
        t = Table(self.out_schema.names(), cols, nout)
        if shrink:
            # downstream operators compile per capacity: right-size the
            # buffers they will see.  The first run pays one count sync and
            # LEARNS the capacity; repeated runs of the same plan truncate
            # to the learned size with zero syncs, recording an overflow
            # flag into the speculation window (same contract as the
            # learned join capacities, ops/join.py) so data growth reruns
            # exactly instead of silently losing rows.  Morsel-fed stages
            # (src=) keep the per-call sync: morsel live counts vary.
            learned = self._learned_caps.get(sig) if owned_source else None
            if learned is not None and K.spec_active():
                if learned < t.capacity:
                    K.spec_record((t.nrows_dev > learned).astype(jnp.int32))
                    t = Table(
                        t.names,
                        [c.with_capacity(learned) for c in t.columns],
                        jnp.minimum(t.nrows_dev, learned),
                    )
                t._cap_learned = True  # downstream shrinks can skip their sync
                return t
            tgt = round_capacity(t.nrows)
            if owned_source:
                self._learned_caps[sig] = tgt
                if tgt < t.capacity:
                    t = t.with_capacity(tgt)
            else:
                # morsel-fed stage: per-morsel live counts jitter between
                # capacity buckets, and every distinct output capacity
                # recompiles every downstream operator — RATCHET to the
                # largest capacity seen so shapes stabilize after the
                # first morsels
                key = ("morsel",) + sig
                tgt = max(tgt, self._learned_caps.get(key, 0))
                self._learned_caps[key] = tgt
                if tgt != t.capacity:
                    t = t.with_capacity(tgt)
        return t

    # ------------------------------------------------------------------
    def _table_view(self, datas, valids, base: Table) -> Table:
        cols = [
            Column(c.dtype, d, v, c.dictionary, vrange=c.vrange)
            for c, d, v in zip(base.columns, datas, valids)
        ]
        return Table(list(base.names), cols, 0)

    def _infer_dicts(self, src: Table):
        t = self._stage_meta_table(src)
        return [c.dictionary for c in t.columns]

    def _stage_meta_table(self, src: Table) -> Table:
        """Tiny host evaluation to learn output dictionaries (1 dead row)."""
        datas = tuple(jnp.zeros(1, c.data.dtype) for c in src.columns)
        valids = tuple(jnp.zeros(1, bool) for c in src.columns)
        t = self._table_view(datas, valids, src)
        for op in self.chain:
            if isinstance(op, ProjectionExec):
                cols = [e.evaluate(t) for e, _ in op.exprs]
                t = Table([n for _, n in op.exprs], cols, 0)
            elif isinstance(op, (FilterExec, SortExec, GlobalLimitExec)):
                pass  # schema/dictionaries unchanged
            elif isinstance(op, WindowAggExec):
                names = list(t.names)
                cols = list(t.columns)
                for w in op.window_exprs:
                    dic = None
                    if w.args and w.fun in (
                        "lag", "lead", "first_value", "last_value",
                        "nth_value", "min", "max",
                    ):
                        dic = w.args[0].evaluate(t).dictionary
                    names.append(w.name)
                    cols.append(
                        Column(
                            w.dtype,
                            jnp.zeros(1, w.dtype.storage_np_dtype()),
                            jnp.zeros(1, bool),
                            dic,
                        )
                    )
                t = Table(names, cols, 0)
            elif isinstance(op, HashAggregateExec):
                key_cols = [e.evaluate(t) for e, _ in op.group_expr]
                names = [n for _, n in op.group_expr]
                cols = list(key_cols)
                if op.mode == "partial":
                    for a in op.aggr_expr:
                        for sn, sd in a.state_fields():
                            names.append(sn)
                            cols.append(
                                Column(sd, jnp.zeros(1, sd.storage_np_dtype()), jnp.zeros(1, bool), None)
                            )
                else:
                    for a in op.aggr_expr:
                        rt = a.return_type()
                        dic = None
                        if a.fun in ("min", "max") and a.expr is not None:
                            dic = a.expr.evaluate(t).dictionary
                        names.append(a.name)
                        cols.append(
                            Column(rt, jnp.zeros(1, rt.storage_np_dtype()), jnp.zeros(1, bool), dic)
                        )
                t = Table(names, cols, 0)
        return t

    # ------------------------------------------------------------------
    def _run(self, datas, valids, nrows, base=None, int_ranges=None):
        src_table = self._table_view(
            datas, valids, base if base is not None else self.source.execute()
        )
        t = src_table
        cur_d = list(datas)
        cur_v = list(valids)
        cap = cur_d[0].shape[0] if cur_d else 0
        alive = jnp.arange(cap) < nrows
        compacted = True  # live rows currently at the front
        n = nrows

        def compact():
            # one compaction: all columns ride one variadic stable sort
            # keyed on ~alive (kernels.py co-sorting note: payload-carrying
            # sorts beat argsort+gather ~6x on TPU; never a scatter)
            nonlocal cur_d, cur_v, alive, compacted, n, cap
            nn = jnp.sum(alive)
            live_sorted = jnp.arange(cap) < nn
            _, moved = K.cosort((~alive,), tuple(cur_d) + tuple(cur_v))
            cur_d = list(moved[: len(cur_d)])
            cur_v = [v & live_sorted for v in moved[len(cur_d):]]
            alive = live_sorted
            n = nn
            compacted = True

        for op in self.chain:
            if isinstance(op, FilterExec):
                view = self._table_view(cur_d, cur_v, t)
                p = op.predicate.evaluate(view)
                # no compaction: fold the predicate into the row mask
                alive = alive & p.data.astype(bool) & p.valid
                compacted = False
            elif isinstance(op, ProjectionExec):
                view = self._table_view(cur_d, cur_v, t)
                outs = [e.evaluate(view) for e, _ in op.exprs]
                cur_d = [c.data for c in outs]
                cur_v = [c.valid for c in outs]
                t = Table([nm for _, nm in op.exprs], outs, 0)
            elif isinstance(op, HashAggregateExec):
                view = self._table_view(cur_d, cur_v, t)
                cur_d, cur_v, n, meta = _traced_aggregate(
                    op, view, alive, cap, int_ranges
                )
                cap = cur_d[0].shape[0] if cur_d else 0
                alive = jnp.arange(cap) < n
                compacted = True
                t = Table(
                    [nm for nm, _, _ in meta],
                    [
                        Column(dt, d, v, dic)
                        for (nm, dt, dic), d, v in zip(meta, cur_d, cur_v)
                    ],
                    0,
                )
            elif isinstance(op, SortExec):
                if not compacted:
                    compact()
                view = self._table_view(cur_d, cur_v, t)
                ordkeys, kvalids, descs, nfs = [], [], [], []
                for s in op.sort_exprs:
                    c = s.expr.evaluate(view)
                    ordkeys.append(K.orderable_key(c.data, c.dtype, c.vrange))
                    kvalids.append(c.valid)
                    descs.append(not s.ascending)
                    nfs.append(s.nulls_first)
                # all columns ride the sorting network as payloads
                moved, _ = K.lexsort_apply(
                    tuple(ordkeys), tuple(kvalids),
                    tuple(cur_d) + tuple(cur_v),
                    n, tuple(descs), tuple(nfs),
                )
                cur_d = list(moved[: len(cur_d)])
                cur_v = list(moved[len(cur_d):])
                if op.fetch is not None:
                    n = jnp.minimum(n, op.fetch)
                    alive = jnp.arange(cap) < n
            elif isinstance(op, GlobalLimitExec):
                if not compacted:
                    compact()
                n = jnp.minimum(n, op.n)
                alive = jnp.arange(cap) < n
            elif isinstance(op, WindowAggExec):
                if not compacted:
                    compact()
                view = self._table_view(cur_d, cur_v, t)
                names2, cols2 = op._traced_window(view, n, cap)
                cur_d = [c.data for c in cols2]
                cur_v = [c.valid for c in cols2]
                t = Table(
                    list(names2),
                    [Column(c.dtype, c.data, c.valid, c.dictionary) for c in cols2],
                    0,
                )
                alive = jnp.arange(cap) < n
            else:  # pragma: no cover
                raise InternalError(f"unfusable op {type(op).__name__}")

        if not compacted:
            compact()
        return tuple(cur_d), tuple(cur_v), n


def _small_domain(key_cols, aggr_expr, int_ranges=None) -> int | None:
    """Total direct-index domain if all keys are small dictionary/bool —
    or small-range integers when the caller probed their (min, base)
    eagerly (int_ranges: {key_index: (min, base)})."""
    if any(a.distinct or a.udf is not None for a in aggr_expr):
        return None  # distinct/UDAF need the sort path
    total = 1
    for i, c in enumerate(key_cols):
        if c.dtype.is_string and c.dictionary is not None:
            total *= max(len(c.dictionary), 1) + 1  # +1 for NULL slot
        elif c.dtype.is_bool:
            total *= 3
        elif int_ranges is not None and i in int_ranges:
            total *= int_ranges[i][1] + 1
        else:
            return None
        if total > FUSED_DOMAIN_LIMIT:
            return None
    return total


def _agg_out_meta(op: HashAggregateExec, key_cols, emit_state):
    """(name, dtype, dictionary) per output column of a traced aggregate."""
    meta = [
        (name, kc.dtype, kc.dictionary)
        for kc, (_, name) in zip(key_cols, op.group_expr)
    ]
    for a in op.aggr_expr:
        if emit_state:
            for sn, sd in a.state_fields():
                meta.append((sn, sd, None))
        else:
            dic = None
            if a.fun in ("min", "max") and a.expr is not None:
                dic = getattr(a.expr, "_meta_dict", None)
            meta.append((a.name, a.return_type(), dic))
    return meta


def _traced_aggregate(op: HashAggregateExec, t: Table, alive, cap, int_ranges=None):
    key_cols = [e.evaluate(t) for e, _ in op.group_expr]
    emit_state = op.mode == "partial"

    # ---- no group keys: plain masked reductions --------------------------
    if not key_cols:
        out_cap = round_capacity(1)  # static shrink: 1 output row
        out_d, out_v = [], []
        for a in op.aggr_expr:
            cols = _eval_aggregate_nogroup(a, t, alive, out_cap, emit_state)
            for c in cols:
                out_d.append(c.data)
                out_v.append(c.valid)
        return out_d, out_v, jnp.int64(1), _agg_out_meta(op, [], emit_state)

    domain = _small_domain(key_cols, op.aggr_expr, int_ranges)
    if domain is not None:
        return _fused_small_domain_aggregate(
            op, t, key_cols, domain, alive, cap, emit_state, int_ranges
        )

    # ---- general path: ONE sort — rows ordered by group key with EVERY
    # column riding as payload and dead rows (filter mask included) landing
    # last.  No compaction pre-pass, no perm gathers: aggregates evaluate
    # directly on the sorted table (kernels.py co-sorting note). ----
    n = jnp.sum(alive)
    key_cols_raw = [e.evaluate(t) for e, _ in op.group_expr]
    ordkeys = tuple(K.orderable_key(c.data, c.dtype, c.vrange) for c in key_cols_raw)
    kvalids = tuple(c.valid & alive for c in key_cols_raw)
    ncols = len(t.columns)
    nk = len(key_cols_raw)
    payloads = (
        tuple(c.data for c in t.columns)
        + tuple(c.valid for c in t.columns)
        + tuple(c.data for c in key_cols_raw)
        + kvalids
        + ordkeys
    )
    moved, _ = K.lexsort_apply(
        ordkeys,
        kvalids,
        payloads,
        n,
        tuple(False for _ in key_cols_raw),
        tuple(True for _ in key_cols_raw),
        dead_mask=~alive,
    )
    alive_sorted = jnp.arange(cap) < n
    s_data = moved[:ncols]
    s_valid = moved[ncols : 2 * ncols]
    sk_data = moved[2 * ncols : 2 * ncols + nk]
    sk_valid = moved[2 * ncols + nk : 2 * ncols + 2 * nk]
    sk_ord = moved[2 * ncols + 2 * nk :]
    tc = Table(
        list(t.names),
        [
            Column(c.dtype, d, v & alive_sorted, c.dictionary)
            for c, d, v in zip(t.columns, s_data, s_valid)
        ],
        0,
    )
    gid, ngroups = K.group_ids_sorted(sk_ord, sk_valid, n)
    out_d, out_v = [], []
    fi = _segment_first_index(gid, cap, alive_sorted).astype(jnp.int32)
    gvalid_rows = jnp.arange(cap) < ngroups
    # ONE packed gather for all key columns + validity masks
    kd, kv, _ = K.take_rows(tuple(sk_data), tuple(sk_valid), fi)
    for skd, skv in zip(kd, kv):
        out_d.append(skd)
        out_v.append(skv & gvalid_rows)
    key_cols = key_cols_raw  # for _agg_out_meta (dtypes/dictionaries)
    agg_dicts = {}

    def _agg_loop():
        return [
            _eval_aggregate(
                a, tc, None, gid, cap, alive_sorted, ngroups, emit_state=emit_state
            )
            for a in op.aggr_expr
        ]

    # batch every reduction's boundary gather into one packed row gather
    for a, cols in zip(op.aggr_expr, K.seg_batch(_agg_loop)):
        if a.fun in ("min", "max") and a.expr is not None and not emit_state:
            agg_dicts[a.name] = cols[0].dictionary
        for c in cols:
            out_d.append(c.data)
            out_v.append(c.valid)
    meta = _agg_out_meta(op, key_cols, emit_state)
    meta = [
        (nm, dt, agg_dicts.get(nm, dic)) for nm, dt, dic in meta
    ]
    return out_d, out_v, ngroups, meta


# ---------------------------------------------------------------------------
# fused small-domain path: one [domain, N] masked reduce per aggregate
# ---------------------------------------------------------------------------


def _fused_small_domain_aggregate(
    op, t, key_cols, domain, alive, cap, emit_state, int_ranges=None
):
    # slot id per row: sum(code_i * stride_i); codes are sorted dictionary
    # indices (or offset integers), so arithmetic order == group sort
    # order.  Dead rows get slot `domain` (outside every compare row).
    gid = jnp.zeros(cap, jnp.int32)
    stride = 1
    for i in reversed(range(len(key_cols))):
        c = key_cols[i]
        if c.dtype.is_string and c.dictionary is not None:
            base = max(len(c.dictionary), 1) + 1
            code = jnp.where(c.valid, c.data.astype(jnp.int32) + 1, 0)
        elif c.dtype.is_bool:
            base = 3
            code = jnp.where(c.valid, c.data.astype(jnp.int32) + 1, 0)
        else:  # probed small-range integer
            mn, base_n = int_ranges[i]
            base = base_n + 1
            code = jnp.where(
                c.valid,
                jnp.clip(c.data.astype(jnp.int64) - mn, 0, base_n - 1).astype(jnp.int32) + 1,
                0,
            )
        gid = gid + code * stride
        stride *= base
    gid = jnp.where(alive, gid, domain)

    slots = jnp.arange(domain, dtype=jnp.int32)
    hit = gid[None, :] == slots[:, None]  # [D, N] — fused into each reduce

    counts = jnp.sum(hit, axis=1)  # rows per slot
    present = counts > 0
    dense = jnp.cumsum(present.astype(jnp.int32)) - 1  # compacted group id
    ngroups = jnp.sum(present).astype(jnp.int64)

    # slot of each compacted group (tiny domain-sized scatter)
    slot_of_group = (
        jnp.zeros(domain, jnp.int32)
        .at[jnp.clip(dense, 0, domain - 1)]
        .max(jnp.where(present, slots, 0), mode="drop")
    )

    # representative (first) row per slot -> per compacted group
    ar = jnp.arange(cap, dtype=jnp.int32)
    first_idx = jnp.min(jnp.where(hit, ar[None, :], cap - 1), axis=1)  # [D]
    first_per_group = first_idx[slot_of_group]

    # static in-trace shrink: at most `domain` groups can exist, so emit
    # small buffers — downstream sort/projection then touch KBs, not GBs
    out_cap = min(cap, round_capacity(domain))
    gvalid_row = jnp.arange(out_cap) < ngroups
    out_d, out_v = [], []
    src = jnp.clip(first_per_group, 0, cap - 1)
    for c in key_cols:
        out_d.append(_pad_to(c.data[src], out_cap, c.data.dtype))
        out_v.append(_pad_to(c.valid[src], out_cap, jnp.bool_) & gvalid_row)

    # Pallas one-pass path: when the backend supports it, every sum/count/
    # avg over integer/decimal storage comes from ONE fused kernel pass
    # (ops/pallas_kernels.py) instead of one [D, N] reduce per aggregate.
    pk = _pallas_precompute(op, t, gid, domain, cap)

    for ai, a in enumerate(op.aggr_expr):
        if pk is not None and ai in pk:
            slots_out = _slots_from_pallas(a, *pk[ai], emit_state=emit_state)
        else:
            slots_out = _eval_aggregate_slots(a, t, hit, emit_state)
        for data, valid in slots_out:
            # reorder [D] slot values into compacted group order, pad out
            out_d.append(_pad_to(data[slot_of_group], out_cap, data.dtype))
            out_v.append(_pad_to(valid[slot_of_group], out_cap, jnp.bool_) & gvalid_row)
    meta = _agg_out_meta(op, key_cols, emit_state)
    if not emit_state:
        # min/max over strings keep the argument's dictionary
        agg_dicts = {
            a.name: a.expr.evaluate(t).dictionary
            for a in op.aggr_expr
            if a.fun in ("min", "max") and a.expr is not None
        }
        meta = [(nm, dt, agg_dicts.get(nm, dic)) for nm, dt, dic in meta]
    return out_d, out_v, ngroups, meta


def _pallas_mode():
    """'tpu' | 'interpret' | None: is the pallas aggregate kernel usable?"""
    import os

    if os.environ.get("DATAFUSION_TPU_DISABLE_PALLAS"):
        return None
    force = os.environ.get("DATAFUSION_TPU_FORCE_PALLAS")
    if force:
        return "interpret" if force == "interpret" else "tpu"
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return None
    return "tpu" if plat in ("tpu", "axon") else None


def _pallas_agg_item(a: PhysAggExpr, t: Table):
    """(data_i64, mask, kind, scale) if `a` is computable by the pallas
    sum/count kernel (exact int64 limb sums), else None."""
    if a.distinct or a.udf is not None:
        return None
    if a.expr is None:  # COUNT(*)
        return (None, None, "count", 0)
    v = a.expr.evaluate(t)
    if a.fun == "count":
        return (None, v.valid, "count", 0)
    if not (v.dtype.is_integer or v.dtype.is_decimal):
        return None
    if a.fun == "sum" and a.return_type().storage_np_dtype() == np.int64:
        return (v.data.astype(jnp.int64), v.valid, "sum", 0)
    if a.fun == "avg":
        scale = v.dtype.scale if v.dtype.is_decimal else 0
        return (v.data.astype(jnp.int64), v.valid, "avg", scale)
    return None


def _pallas_precompute(op, t: Table, gid, domain: int, cap: int):
    """Run the fused pallas kernel for every eligible aggregate; returns
    {agg_index: (sum_slots, cnt_slots, kind, scale)} or None."""
    from ..ops import pallas_kernels as PK

    mode = _pallas_mode()
    if mode is None or cap % (PK.TILE_SUBLANES * 128) != 0:
        return None
    items = {}
    for ai, a in enumerate(op.aggr_expr):
        it = _pallas_agg_item(a, t)
        if it is not None:
            items[ai] = it
    if len(items) < 2:  # one [D,N] reduce is fine; the win is amortization
        return None
    # chunk to <= 4 value columns per kernel call: 13 double-buffered VMEM
    # planes fit comfortably; 22 (7 columns) blow the ~16 MB VMEM budget
    # and the compile fails
    out = {}
    ordered = list(items.items())
    for lo_i in range(0, len(ordered), 4):
        chunk = ordered[lo_i : lo_i + 4]
        datas = tuple(
            (d if d is not None else jnp.zeros(cap, jnp.int64))
            for _, (d, _, _, _) in chunk
        )
        masks = tuple(
            (m if m is not None else jnp.ones(cap, bool))
            for _, (_, m, _, _) in chunk
        )
        sums, cnts = PK.smalldomain_sum_count(
            gid, datas, masks, domain, interpret=(mode == "interpret")
        )
        for j, (ai, it) in enumerate(chunk):
            out[ai] = (sums[:, j], cnts[:, j], it[2], it[3])
    return out


def _slots_from_pallas(a, s_i64, cnt, kind, scale, emit_state):
    """Map kernel (sum, count) slots into _eval_aggregate_slots' output
    forms (state layouts must match _agg_out_meta exactly)."""
    cnt64 = cnt.astype(jnp.int64)
    ones = jnp.ones_like(cnt64, bool)
    has = cnt64 > 0
    if kind == "count":
        return [(cnt64, ones)]
    if kind == "sum":
        if emit_state:
            return [(s_i64, has), (cnt64, ones)]
        return [(s_i64, has)]
    # avg: float state/result, descaled for decimals (same as _slot_float)
    sf = s_i64.astype(jnp.float64) / (10 ** scale)
    if emit_state:
        return [(sf, ones), (cnt64, ones)]
    return [(sf / jnp.maximum(cnt64, 1), has)]


def _masked_reduce_sum(hit, vals, zero):
    return jnp.sum(jnp.where(hit, vals[None, :], zero), axis=1)


def _eval_aggregate_slots(a: PhysAggExpr, t: Table, hit, emit_state):
    """Per-slot ([D]-shaped) aggregate values as (data, valid) pairs."""
    f = a.fun

    if a.expr is None:  # COUNT(*)
        cnt = jnp.sum(hit, axis=1).astype(jnp.int64)
        return [(cnt, jnp.ones_like(cnt, bool))]

    v = a.expr.evaluate(t)
    vv = hit & v.valid[None, :]  # [D, N] valid-and-in-slot
    cnt = jnp.sum(vv, axis=1).astype(jnp.int64)
    has = cnt > 0

    if f == "count":
        return [(cnt, jnp.ones_like(cnt, bool))]

    if f == "sum":
        rt = a.return_type()
        acc = v.data.astype(rt.storage_np_dtype())
        s = jnp.sum(jnp.where(vv, acc[None, :], acc.dtype.type(0)), axis=1)
        if emit_state:
            return [(s, has), (cnt, jnp.ones_like(cnt, bool))]
        return [(s, has)]

    if f in ("min", "max"):
        t_in = v.dtype
        if t_in.is_float:
            neutral = jnp.inf if f == "min" else -jnp.inf
            vals = jnp.where(vv, v.data[None, :], neutral)
            red = jnp.min(vals, axis=1) if f == "min" else jnp.max(vals, axis=1)
            out = red.astype(t_in.storage_np_dtype())
        else:
            ordk = K.orderable_key(v.data, t_in)
            big = jnp.asarray(
                jnp.iinfo(ordk.dtype).max if f == "min" else jnp.iinfo(ordk.dtype).min,
                ordk.dtype,
            )
            vals = jnp.where(vv, ordk[None, :], big)
            red = jnp.min(vals, axis=1) if f == "min" else jnp.max(vals, axis=1)
            out = red.astype(t_in.storage_np_dtype())
        if emit_state:
            return [(out, has), (cnt, jnp.ones_like(cnt, bool))]
        return [(out, has)]

    if f == "avg":
        fd = _slot_float(v)
        s = jnp.sum(jnp.where(vv, fd[None, :], 0.0), axis=1)
        if emit_state:
            return [(s, jnp.ones_like(has)), (cnt, jnp.ones_like(cnt, bool))]
        mean = s / jnp.maximum(cnt, 1)
        return [(mean, has)]

    if f in ("variance", "var", "var_samp", "var_pop", "stddev", "stddev_samp", "stddev_pop"):
        fd = _slot_float(v)
        s = jnp.sum(jnp.where(vv, fd[None, :], 0.0), axis=1)
        ss = jnp.sum(jnp.where(vv, (fd * fd)[None, :], 0.0), axis=1)
        if emit_state:
            ones = jnp.ones_like(has)
            return [(cnt, ones), (s, ones), (ss, ones)]
        nf = cnt.astype(jnp.float64)
        mean = s / jnp.maximum(nf, 1.0)
        m2 = jnp.maximum(ss - nf * mean * mean, 0.0)
        pop = f.endswith("_pop")
        denom = jnp.maximum(nf if pop else nf - 1.0, 1.0)
        var = m2 / denom
        out = jnp.sqrt(var) if f.startswith("stddev") else var
        min_n = 1 if pop else 2
        return [(out, cnt >= min_n)]

    raise PlanError(f"aggregate '{f}' not implemented in fused path")


def _eval_aggregate_nogroup(a: PhysAggExpr, t: Table, alive, out_cap, emit_state):
    """Aggregate over ALL live rows -> 1 output row (padded to out_cap)."""
    f = a.fun

    def one(x, valid_scalar, dtype):
        data = jnp.zeros(out_cap, dtype).at[0].set(x.astype(dtype))
        valid = jnp.zeros(out_cap, bool).at[0].set(valid_scalar)
        return Column(None, data, valid)  # dtype unused by caller

    if a.distinct:
        # sort-based distinct over the mask (rare; COUNT(DISTINCT x))
        return _eval_aggregate_nogroup_distinct(a, t, alive, out_cap, emit_state)

    if a.udf is not None:
        v = a.expr.evaluate(t)
        m = alive & v.valid
        rt = a.return_type()
        sdt = rt.storage_np_dtype()
        x = jnp.where(m, v.data.astype(sdt), sdt.type(a.udf.zero))
        run = jax.lax.associative_scan(a.udf.step, x)
        acc = run[-1]
        cnt = jnp.sum(m).astype(jnp.int64)
        if emit_state:
            return [one(acc, True, sdt), one(cnt, True, jnp.int64)]
        out = acc if a.udf.finalize is None else a.udf.finalize(acc, cnt)
        return [one(out, cnt > 0, sdt)]

    if a.expr is None:
        cnt = jnp.sum(alive).astype(jnp.int64)
        return [one(cnt, True, jnp.int64)]

    v = a.expr.evaluate(t)
    m = alive & v.valid
    cnt = jnp.sum(m).astype(jnp.int64)
    has = cnt > 0

    if f == "count":
        return [one(cnt, True, jnp.int64)]
    if f == "sum":
        rt = a.return_type()
        dt = rt.storage_np_dtype()
        s = jnp.sum(jnp.where(m, v.data.astype(dt), dt.type(0)))
        if emit_state:
            return [one(s, has, dt), one(cnt, True, jnp.int64)]
        return [one(s, has, dt)]
    if f in ("min", "max"):
        t_in = v.dtype
        dt = t_in.storage_np_dtype()
        if t_in.is_float:
            neutral = jnp.inf if f == "min" else -jnp.inf
            red = (jnp.min if f == "min" else jnp.max)(jnp.where(m, v.data, neutral))
        else:
            ordk = K.orderable_key(v.data, t_in)
            big = jnp.asarray(
                jnp.iinfo(ordk.dtype).max if f == "min" else jnp.iinfo(ordk.dtype).min,
                ordk.dtype,
            )
            red = (jnp.min if f == "min" else jnp.max)(jnp.where(m, ordk, big))
        if emit_state:
            return [one(red.astype(dt), has, dt), one(cnt, True, jnp.int64)]
        return [one(red.astype(dt), has, dt)]
    if f == "avg":
        fd = _slot_float(v)
        s = jnp.sum(jnp.where(m, fd, 0.0))
        if emit_state:
            return [one(s, True, jnp.float64), one(cnt, True, jnp.int64)]
        return [one(s / jnp.maximum(cnt, 1), has, jnp.float64)]
    if f in ("variance", "var", "var_samp", "var_pop", "stddev", "stddev_samp", "stddev_pop"):
        fd = _slot_float(v)
        s = jnp.sum(jnp.where(m, fd, 0.0))
        ss = jnp.sum(jnp.where(m, fd * fd, 0.0))
        if emit_state:
            return [
                one(cnt, True, jnp.int64),
                one(s, True, jnp.float64),
                one(ss, True, jnp.float64),
            ]
        nf = cnt.astype(jnp.float64)
        mean = s / jnp.maximum(nf, 1.0)
        m2 = jnp.maximum(ss - nf * mean * mean, 0.0)
        pop = f.endswith("_pop")
        var = m2 / jnp.maximum(nf if pop else nf - 1.0, 1.0)
        out = jnp.sqrt(var) if f.startswith("stddev") else var
        min_n = 1 if pop else 2
        return [one(out, cnt >= min_n, jnp.float64)]
    raise PlanError(f"aggregate '{f}' not implemented in fused path")


def _eval_aggregate_nogroup_distinct(a, t, alive, out_cap, emit_state):
    """COUNT/SUM(DISTINCT x) without groups: sort values, mask duplicates."""
    v = a.expr.evaluate(t)
    cap = alive.shape[0]  # input capacity (sort runs over input rows)
    ordk = K.orderable_key(v.data, v.dtype)
    m = alive & v.valid
    sentinel = (
        jnp.inf
        if jnp.issubdtype(ordk.dtype, jnp.floating)
        else jnp.asarray(jnp.iinfo(ordk.dtype).max, ordk.dtype)
    )
    keys = jnp.where(m, ordk, sentinel)
    sk = jnp.sort(keys)
    live = jnp.arange(cap) < jnp.sum(m)
    firsts = live & ((jnp.arange(cap) == 0) | (sk != jnp.roll(sk, 1)))
    cnt = jnp.sum(firsts).astype(jnp.int64)
    f = a.fun

    def one(x, valid_scalar, dtype):
        data = jnp.zeros(out_cap, dtype).at[0].set(x.astype(dtype))
        valid = jnp.zeros(out_cap, bool).at[0].set(valid_scalar)
        return Column(None, data, valid)

    if f == "count":
        return [one(cnt, True, jnp.int64)]
    if f in ("sum", "avg"):
        rt = a.return_type()
        dt = rt.storage_np_dtype() if f == "sum" else np.dtype(np.float64)
        vals = jnp.where(firsts, sk, 0)
        if f == "avg":
            s = jnp.sum(vals.astype(jnp.float64))
            if v.dtype.is_decimal:  # orderable key is the scaled int
                s = s / (10**v.dtype.scale)
            return [one(s / jnp.maximum(cnt, 1), cnt > 0, jnp.float64)]
        # accumulate at the RETURN width (keys may ride narrowed int32)
        s = jnp.sum(vals.astype(dt))
        return [one(s, cnt > 0, dt)]
    if f in ("min", "max"):
        return _eval_aggregate_nogroup(
            PhysAggExpr(f, a.expr, a.name, False), t, alive, out_cap, emit_state
        )
    raise PlanError(f"DISTINCT {f} not supported")


def _slot_float(v):
    if v.dtype.is_decimal:
        return v.data.astype(jnp.float64) / (10**v.dtype.scale)
    return v.data.astype(jnp.float64)


def _pad_to(x, cap, dtype):
    n = x.shape[0]
    if n == cap:
        return x.astype(dtype)
    if n > cap:
        return x[:cap].astype(dtype)
    return jnp.concatenate([x.astype(dtype), jnp.zeros(cap - n, dtype)])
