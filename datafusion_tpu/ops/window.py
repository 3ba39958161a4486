"""WindowAggExec equivalent: window functions via segment scans.

Reference: /root/reference/datafusion/src/physical_plan/windows/
(window_agg_exec.rs:42, aggregate.rs:36 AggregateWindowExpr, built_in.rs:35)
— per-partition ranges found with `lexicographical_partition_ranges` and
evaluated per range.

TPU-native: one lexsort by (partition keys, order keys), partition ids from
boundary detection, then every function is a vectorized segment scan:
  row_number    -> arange - segment_start
  rank          -> order-key boundary positions rebased per segment
  dense_rank    -> cumsum of order-key boundaries per segment
  percent_rank / cume_dist -> rank arithmetic over segment sizes
  ntile(n)      -> bucket arithmetic
  lag/lead      -> shifted gather with partition guard
  first/last/nth_value -> segment-start/end gathers
  aggregates    -> running (cumulative) segment scan with ORDER BY,
                   whole-segment reduction without (default-frame semantics,
                   matching the reference's WindowFrame handling)
Output rows stay in (partition, order) sorted order, like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table
from ..errors import PlanError
from ..exprs.physical import PhysicalExpr
from ..functions.aggregates import is_aggregate_function
from ..types import Field, Schema
from ..types.dtypes import DataType, FLOAT64, INT64, UINT64
from . import kernels as K
from .base import ExecutionPlan
from .sort import PhysSortExpr


class PhysWindowExpr:
    def __init__(
        self,
        fun: str,
        args: list[PhysicalExpr],
        partition_by: list[PhysicalExpr],
        order_by: list[PhysSortExpr],
        name: str,
        dtype: DataType,
        frame=None,
    ):
        self.fun = fun.lower()
        self.args = args
        self.partition_by = partition_by
        self.order_by = order_by
        self.name = name
        self.dtype = dtype
        self.frame = frame

    def __repr__(self):
        return f"{self.fun}(...) as {self.name}"


class WindowAggExec(ExecutionPlan):
    def __init__(self, window_exprs: list[PhysWindowExpr], input: ExecutionPlan):
        super().__init__()
        self.window_exprs = window_exprs
        self.input = input

    def schema(self) -> Schema:
        fields = list(self.input.schema().fields)
        for w in self.window_exprs:
            fields.append(Field(w.name, w.dtype, True))
        return Schema(fields)

    def children(self):
        return [self.input]

    def with_new_children(self, c):
        return WindowAggExec(self.window_exprs, c[0])

    def _execute(self) -> Table:
        t = self.input.execute()
        # whole-window jit: the sort, partition detection, and every window
        # expression trace into ONE XLA program (eager dispatch costs ~3 ms
        # per op through a remote-TPU serving path)
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        key = (
            t.capacity,
            tuple(str(c.dtype) for c in t.columns),
            tuple(id(c.dictionary) for c in t.columns),
        )
        entry = self._jit_cache.get(key)
        if entry is None:
            names0 = list(t.names)
            dtypes0 = [c.dtype for c in t.columns]
            dicts0 = [c.dictionary for c in t.columns]
            meta_box: list = []

            def body(datas, valids, nrows):
                cols_in = [
                    Column(dt, d, v, dic)
                    for dt, dic, d, v in zip(dtypes0, dicts0, datas, valids)
                ]
                view = Table(list(names0), cols_in, 0)
                out_names, out_cols = self._traced_window(view, nrows, t.capacity)
                if not meta_box:
                    meta_box.append(
                        [(n, c.dtype, c.dictionary) for n, c in zip(out_names, out_cols)]
                    )
                return tuple(c.data for c in out_cols), tuple(
                    c.valid for c in out_cols
                )

            entry = (jax.jit(body), meta_box)
            self._jit_cache[key] = entry
        fn, meta_box = entry
        out_d, out_v = fn(
            tuple(c.data for c in t.columns),
            tuple(c.valid for c in t.columns),
            t.nrows_dev,
        )
        meta = meta_box[0]
        cols = [
            Column(dt, d, v, dic)
            for (nm, dt, dic), d, v in zip(meta, out_d, out_v)
        ]
        return Table([nm for nm, _, _ in meta], cols, t.nrows_dev)

    def _traced_window(self, t: Table, nrows, cap):
        # all window exprs in one exec share partition/order (the planner
        # groups them); sort once by the first expr's keys
        w0 = self.window_exprs[0]
        sort_specs = [PhysSortExpr(p, True, True) for p in w0.partition_by] + list(
            w0.order_by
        )
        if sort_specs:
            from .sort import sort_table

            t = sort_table(Table(t.names, t.columns, nrows), sort_specs)
        alive = jnp.arange(cap) < nrows

        # partition ids
        if w0.partition_by:
            pcols = [p.evaluate(t) for p in w0.partition_by]
            ordk = tuple(K.orderable_key(c.data, c.dtype) for c in pcols)
            valids = tuple(c.valid for c in pcols)
            gid, nparts = K.group_ids_sorted(ordk, valids, nrows)
        else:
            gid = jnp.where(alive, 0, cap - 1)

        seg_start = _segment_starts(gid, cap, alive)
        ar = jnp.arange(cap)
        pos_in_seg = ar - seg_start[gid]

        names = list(t.names)
        cols = list(t.columns)

        def _loop():  # seg_batch: one packed gather for all boundary reads
            return [
                self._eval_window(w, t, gid, pos_in_seg, seg_start, alive, cap)
                for w in self.window_exprs
            ]

        for w, c in zip(self.window_exprs, K.seg_batch(_loop)):
            names.append(w.name)
            cols.append(c)
        return names, cols

    # ------------------------------------------------------------------
    def _eval_window(self, w: PhysWindowExpr, t, gid, pos, seg_start, alive, cap) -> Column:
        f = w.fun
        ar = jnp.arange(cap)
        seg_count = K.segment_sum(alive.astype(jnp.int64), gid, cap)
        seg_size = seg_count[gid]

        if f == "row_number":
            return Column(UINT64, (pos + 1).astype(jnp.uint64), alive)

        if f in ("rank", "dense_rank", "percent_rank", "cume_dist"):
            # order-key boundaries within partitions
            okeys = [s.expr.evaluate(t) for s in w.order_by]
            boundary = jnp.zeros(cap, bool).at[0].set(True)
            for c in okeys:
                k = K.orderable_key(c.data, c.dtype)
                boundary = boundary | (k != jnp.roll(k, 1)) | (c.valid != jnp.roll(c.valid, 1))
            boundary = boundary | (gid != jnp.roll(gid, 1))
            boundary = boundary.at[0].set(True)
            # rank: 1 + number of rows before the current peer group start
            peer_start = _running_max(jnp.where(boundary, ar, 0))
            rank = (peer_start - seg_start[gid] + 1).astype(jnp.int64)
            if f == "rank":
                return Column(UINT64, rank.astype(jnp.uint64), alive)
            if f == "dense_rank":
                dr = _segment_cumsum(boundary.astype(jnp.int64), gid, seg_start, cap)
                return Column(UINT64, dr.astype(jnp.uint64), alive)
            if f == "percent_rank":
                denom = jnp.maximum(seg_size - 1, 1).astype(jnp.float64)
                return Column(FLOAT64, (rank - 1).astype(jnp.float64) / denom, alive)
            # cume_dist: (# rows <= current peer group end) / size
            nxt_boundary = jnp.roll(boundary, -1).at[cap - 1].set(True)
            # nearest NEXT boundary position = suffix MIN of marked indices
            peer_end = _running_min_reverse(jnp.where(nxt_boundary, ar, cap))
            cd = (peer_end - seg_start[gid] + 1).astype(jnp.float64) / jnp.maximum(
                seg_size, 1
            ).astype(jnp.float64)
            return Column(FLOAT64, cd, alive)

        if f == "ntile":
            from .aggregate import _to_float  # noqa: F401

            n = w.args[0].evaluate(t)
            nt = n.data.astype(jnp.int64)
            sz = jnp.maximum(seg_size, 1)
            bucket = (pos * nt) // sz + 1
            return Column(UINT64, bucket.astype(jnp.uint64), alive)

        if f in ("lag", "lead"):
            v = w.args[0].evaluate(t)
            # offset stays a device scalar: under whole-stage fusion the
            # planner materializes args as columns of the (traced) sorted
            # table, so forcing a host int here would break tracing
            offset = jnp.int64(1)
            if len(w.args) > 1:
                offset = w.args[1].evaluate(t).data[0].astype(jnp.int64)
            shift = -offset if f == "lag" else offset
            src = ar + shift
            in_bounds = (src >= 0) & (src < cap)
            src_c = jnp.clip(src, 0, cap - 1)
            same_part = gid[src_c] == gid
            ok = alive & in_bounds & same_part
            data = v.data[src_c]
            valid = jnp.where(ok, v.valid[src_c], False)
            return Column(v.dtype, data, valid, v.dictionary)

        if f in ("first_value", "last_value", "nth_value"):
            v = w.args[0].evaluate(t)
            if f == "first_value":
                src = seg_start[gid]
            elif f == "last_value":
                src = seg_start[gid] + seg_size - 1
            else:
                # device scalar for the same fused-stage tracing reason as
                # the lag/lead offset above
                n = w.args[1].evaluate(t).data[0].astype(jnp.int64)
                src = seg_start[gid] + (n - 1)
            src_c = jnp.clip(src, 0, cap - 1)
            ok = alive & (src >= seg_start[gid]) & (src < seg_start[gid] + seg_size)
            return Column(v.dtype, v.data[src_c], v.valid[src_c] & ok, v.dictionary)

        if is_aggregate_function(f):
            v = w.args[0].evaluate(t) if w.args else None
            lo, hi = self._frame_bounds(w, t, gid, seg_start, seg_size, alive, cap)
            return _window_aggregate_range(f, v, w.dtype, gid, lo, hi, alive, cap)

        raise PlanError(f"window function '{f}' not implemented")

    # ------------------------------------------------------------------
    def _peer_bounds(self, w, t, gid, seg_start, seg_size, alive, cap):
        """(peer_start, peer_end) absolute indices of the current row's
        ORDER BY peer group (RANGE frame semantics)."""
        ar = jnp.arange(cap)
        if not w.order_by:
            lo = seg_start[gid]
            return lo, lo + seg_size - 1
        okeys = [s.expr.evaluate(t) for s in w.order_by]
        boundary = jnp.zeros(cap, bool).at[0].set(True)
        for c in okeys:
            k = K.orderable_key(c.data, c.dtype)
            boundary = boundary | (k != jnp.roll(k, 1)) | (c.valid != jnp.roll(c.valid, 1))
        boundary = (boundary | (gid != jnp.roll(gid, 1))).at[0].set(True)
        peer_start = _running_max(jnp.where(boundary, ar, 0))
        nxt_boundary = jnp.roll(boundary, -1).at[cap - 1].set(True)
        # nearest NEXT boundary position = suffix MIN of marked indices
        peer_end = _running_min_reverse(jnp.where(nxt_boundary, ar, cap))
        return peer_start, peer_end

    def _frame_bounds(self, w, t, gid, seg_start, seg_size, alive, cap):
        """Per-row inclusive [lo, hi] frame over the sorted row axis
        (window_frames.rs semantics; ROWS with offsets, RANGE/GROUPS with
        UNBOUNDED/CURRENT bounds)."""
        i = jnp.arange(cap)
        seg_lo = seg_start[gid]
        seg_hi = seg_lo + seg_size - 1
        frame = w.frame

        if frame is None:
            if w.order_by:
                # SQL default: RANGE UNBOUNDED PRECEDING .. CURRENT ROW —
                # includes ALL peers of the current row
                _, peer_end = self._peer_bounds(w, t, gid, seg_start, seg_size, alive, cap)
                return seg_lo, peer_end
            return seg_lo, seg_hi

        if frame.units == "range" and (
            frame.start.offset is not None or frame.end.offset is not None
        ):
            return self._range_offset_bounds(
                w, t, gid, seg_start, seg_size, alive, seg_lo, seg_hi, cap, frame
            )

        if frame.units == "groups" and (
            frame.start.offset is not None or frame.end.offset is not None
        ):
            return self._groups_offset_bounds(
                w, t, gid, seg_start, seg_size, alive, seg_lo, seg_hi, cap, frame
            )

        if frame.units in ("range", "groups"):
            if frame.start.offset is not None or frame.end.offset is not None:
                raise PlanError(
                    f"{frame.units.upper()} frames with offsets are not supported"
                )
            ps, pe = self._peer_bounds(w, t, gid, seg_start, seg_size, alive, cap)
            if frame.start.kind == "preceding":  # UNBOUNDED PRECEDING
                lo = seg_lo
            elif frame.start.kind == "current":
                lo = ps
            else:  # following start without offset: UNBOUNDED FOLLOWING
                raise PlanError("frame start UNBOUNDED FOLLOWING is invalid")
            if frame.end.kind == "current":
                hi = pe
            elif frame.end.kind == "following":  # UNBOUNDED FOLLOWING
                hi = seg_hi
            else:
                raise PlanError("frame end UNBOUNDED PRECEDING is invalid")
            return lo, hi

        return self._rows_bounds(frame, gid, seg_lo, seg_hi, cap)

    def _groups_offset_bounds(
        self, w, t, gid, seg_start, seg_size, alive, seg_lo, seg_hi, cap, frame
    ):
        """GROUPS BETWEEN x PRECEDING AND y FOLLOWING: frame spans whole
        ORDER BY peer groups.  The dense peer index within each partition is
        non-decreasing, so the same vectorized bisect as RANGE offsets
        applies with the peer index as the key."""
        okeys = [s.expr.evaluate(t) for s in w.order_by]
        boundary = jnp.zeros(cap, bool).at[0].set(True)
        for c in okeys:
            k = K.orderable_key(c.data, c.dtype)
            boundary = boundary | (k != jnp.roll(k, 1)) | (c.valid != jnp.roll(c.valid, 1))
        boundary = (boundary | (gid != jnp.roll(gid, 1))).at[0].set(True)
        # peer index within partition (restarts at each partition boundary)
        peer_global = jnp.cumsum(boundary.astype(jnp.int64))
        base = peer_global[jnp.clip(seg_lo, 0, cap - 1)]
        peer = peer_global - base  # 0-based group index within partition
        i = jnp.arange(cap)
        cur = peer

        def bisect_left(target):
            lo, hi = seg_lo, jnp.minimum(seg_hi + 1, cap)
            for _ in range(int(np.ceil(np.log2(max(cap, 2)))) + 1):
                mid = (lo + hi) // 2
                midc = jnp.clip(mid, 0, cap - 1)
                go = peer[midc] < target
                lo = jnp.where(go, mid + 1, lo)
                hi = jnp.where(go, hi, mid)
            return lo

        if frame.start.kind == "preceding":
            lo_idx = seg_lo if frame.start.offset is None else bisect_left(
                cur - int(frame.start.offset)
            )
        elif frame.start.kind == "current":
            lo_idx = bisect_left(cur)
        else:
            lo_idx = bisect_left(cur + int(frame.start.offset))
        if frame.end.kind == "following":
            hi_idx = seg_hi if frame.end.offset is None else bisect_left(
                cur + int(frame.end.offset) + 1
            ) - 1
        elif frame.end.kind == "current":
            hi_idx = bisect_left(cur + 1) - 1
        else:
            hi_idx = bisect_left(cur - int(frame.end.offset) + 1) - 1
        lo_idx = jnp.maximum(lo_idx, seg_lo)
        hi_idx = jnp.minimum(hi_idx, seg_hi)
        return lo_idx, hi_idx

    def _range_offset_bounds(
        self, w, t, gid, seg_start, seg_size, alive, seg_lo, seg_hi, cap, frame
    ):
        """RANGE BETWEEN x PRECEDING AND y FOLLOWING over ONE numeric ORDER
        BY key (SQL requires a single key for offset RANGE frames): per-row
        vectorized bisect for the first/last peer whose key lies within
        [cur - x, cur + y] — ~log2(cap) gathers, no loops over rows."""
        if len(w.order_by) != 1:
            raise PlanError("RANGE with offsets requires exactly one ORDER BY key")
        s = w.order_by[0]
        c = s.expr.evaluate(t)
        key = K.orderable_key(c.data, c.dtype)
        if s.ascending is False:
            key = -key  # frames are defined on the sort direction's axis
        i = jnp.arange(cap)
        cur = key[jnp.clip(i, 0, cap - 1)]

        def off(x):
            # offsets live on the SQL value axis; decimal ORDER BY keys are
            # scaled ints, so RANGE 1 PRECEDING over DECIMAL(_,2) must span
            # 100 storage units, not 1
            if c.dtype.is_decimal:
                from fractions import Fraction

                v = Fraction(str(x)) * (10 ** c.dtype.scale)
                if v.denominator != 1:
                    raise PlanError(
                        "RANGE offset finer than the ORDER BY decimal scale"
                    )
                return int(v)
            if c.dtype.is_float:
                return float(x)
            fx = float(x)
            if fx != int(fx):
                raise PlanError(
                    "RANGE offset must be an integer for integer ORDER BY keys"
                )
            return int(fx)

        def bisect_left(target):
            lo, hi = seg_lo, jnp.minimum(seg_hi + 1, cap)
            for _ in range(int(np.ceil(np.log2(max(cap, 2)))) + 1):
                mid = (lo + hi) // 2
                midc = jnp.clip(mid, 0, cap - 1)
                go = key[midc] < target
                lo = jnp.where(go, mid + 1, lo)
                hi = jnp.where(go, hi, mid)
            return lo

        # start bound
        if frame.start.kind == "preceding":
            if frame.start.offset is None:
                lo_idx = seg_lo
            else:
                lo_idx = bisect_left(cur - off(frame.start.offset))
        elif frame.start.kind == "current":
            lo_idx = bisect_left(cur)
        else:  # following with offset
            lo_idx = bisect_left(cur + off(frame.start.offset))
        # end bound: first index with key > bound, minus 1
        if frame.end.kind == "following":
            if frame.end.offset is None:
                hi_idx = seg_hi
            else:
                hi_idx = _bisect_gt(bisect_left, cur, off(frame.end.offset), c) - 1
        elif frame.end.kind == "current":
            hi_idx = _bisect_gt(bisect_left, cur, 0, c) - 1
        else:  # preceding with offset
            hi_idx = _bisect_gt(bisect_left, cur, -off(frame.end.offset), c) - 1
        lo_idx = jnp.maximum(lo_idx, seg_lo)
        hi_idx = jnp.minimum(hi_idx, seg_hi)
        # NULL order keys sort into one run; their frame is that peer group
        nv = ~c.valid
        ps, pe = self._peer_bounds(w, t, gid, seg_start, seg_size, alive, cap)
        lo_idx = jnp.where(nv, ps, lo_idx)
        hi_idx = jnp.where(nv, pe, hi_idx)
        return lo_idx, hi_idx

    def _rows_bounds(self, frame, gid, seg_lo, seg_hi, cap):
        i = jnp.arange(cap)

        # ROWS
        def bound(b, is_start):
            if b.kind == "preceding":
                if b.offset is None:
                    return seg_lo if is_start else jnp.full(cap, -1)
                return i - int(b.offset)
            if b.kind == "current":
                return i
            # following
            if b.offset is None:
                return (jnp.full(cap, cap) if is_start else seg_hi)
            return i + int(b.offset)

        lo = jnp.maximum(bound(frame.start, True), seg_lo)
        hi = jnp.minimum(bound(frame.end, False), seg_hi)
        return lo, hi

    def _display_line(self):
        return f"WindowAggExec: {self.window_exprs}"


# ---------------------------------------------------------------------------


def _bisect_gt(bisect_left, cur, delta, c):
    """First index with key strictly greater than cur+delta: integer-family
    keys step by one storage unit; float keys step to the next
    representable double (+1 would skip peers within (bound, bound+1])."""
    target = cur + delta
    if c.dtype.is_float:
        return bisect_left(jnp.nextafter(target, jnp.inf))
    return bisect_left(target + 1)


def _segment_starts(gid, cap, alive):
    """First row index per segment id (sorted dense gid; no scatter)."""
    first_pos, _ = K._segment_positions(gid)
    return first_pos


def _running_max(x):
    return jax.lax.associative_scan(jnp.maximum, x)


def _running_min_reverse(x):
    return jax.lax.associative_scan(jnp.minimum, x, reverse=True)


def _segment_cumsum(x, gid, seg_start, cap):
    """Cumulative sum within segments (assumes rows sorted by gid)."""
    total = jnp.cumsum(x)
    seg_base = total[seg_start[gid]] - x[seg_start[gid]]
    return total - seg_base


def _range_sum(x, gid, lo, hi, cap):
    """Inclusive per-row window sum over [lo, hi] (indices within the row's
    partition): within-partition prefix scan + two gathers, no scatter."""
    run = K._segment_scan(x, gid, lambda a, b: a + b)  # in-segment prefix
    lo_c = jnp.clip(lo, 0, cap - 1)
    hi_c = jnp.clip(hi, 0, cap - 1)
    prev = jnp.clip(lo_c - 1, 0, cap - 1)
    prev_same = (lo_c > 0) & (gid[prev] == gid[lo_c])
    s = run[hi_c] - jnp.where(prev_same, run[prev], jnp.zeros((), x.dtype))
    return jnp.where(hi >= lo, s, jnp.zeros((), x.dtype))


def _range_minmax(x, lo, hi, cap, opfn, neutral):
    """Per-row window min/max over [lo, hi] via a sparse table: K = log2(cap)
    doubling levels, branchless two-block query.  Query blocks always lie
    inside [lo, hi], so level construction never leaks across partitions."""
    K_levels = max(1, int(np.ceil(np.log2(max(cap, 2)))) + 1)
    levels = [x]
    cur = x
    for k in range(1, K_levels):
        d = 1 << (k - 1)
        shifted = jnp.concatenate([cur[d:], jnp.full(d, neutral, cur.dtype)])
        cur = opfn(cur, shifted)
        levels.append(cur)
    stacked = jnp.stack(levels)  # [K, cap]
    ln = jnp.maximum(hi - lo + 1, 1)
    k = jnp.floor(jnp.log2(ln.astype(jnp.float64))).astype(jnp.int32)
    lo_c = jnp.clip(lo, 0, cap - 1)
    right = jnp.clip(hi - (1 << k.astype(jnp.int64)) + 1, 0, cap - 1)
    a = stacked[k, lo_c]
    b = stacked[k, right]
    out = opfn(a, b)
    return jnp.where(hi >= lo, out, neutral)


def _window_aggregate_range(f, v, dtype, gid, lo, hi, alive, cap):
    """Frame-aware window aggregate over per-row index ranges [lo, hi]
    (AggregateWindowExpr, windows/aggregate.rs:36 — with real frame
    support: ROWS offsets via prefix scans and sparse-table min/max)."""
    from .aggregate import _to_float

    nonempty = hi >= lo

    if f == "count":
        x = (alive if v is None else (v.valid & alive)).astype(jnp.int64)
        out = _range_sum(x, gid, lo, hi, cap)
        return Column(INT64, out, alive)

    assert v is not None
    mask = v.valid & alive
    cnt = _range_sum(mask.astype(jnp.int64), gid, lo, hi, cap)
    has = nonempty & (cnt > 0)

    if f == "sum":
        acc = v.data.astype(dtype.storage_np_dtype())
        x = jnp.where(mask, acc, jnp.zeros((), acc.dtype))
        out = _range_sum(x, gid, lo, hi, cap)
        return Column(dtype, out, alive & has)
    if f in ("avg", "mean"):
        fx = _to_float(v.data, v.dtype)
        x = jnp.where(mask, fx, 0.0)
        s = _range_sum(x, gid, lo, hi, cap)
        return Column(FLOAT64, s / jnp.maximum(cnt, 1), alive & has)
    if f in ("min", "max"):
        opfn = jnp.minimum if f == "min" else jnp.maximum
        if v.dtype.is_float:
            neutral = jnp.inf if f == "min" else -jnp.inf
            x = jnp.where(mask, v.data, neutral)
        else:
            ordk = K.orderable_key(v.data, v.dtype)
            neutral = jnp.asarray(
                jnp.iinfo(ordk.dtype).max if f == "min" else jnp.iinfo(ordk.dtype).min,
                ordk.dtype,
            )
            x = jnp.where(mask, ordk, neutral)
        out = _range_minmax(x, lo, hi, cap, opfn, neutral)
        out = out.astype(v.dtype.storage_np_dtype())
        return Column(v.dtype, out, alive & has, v.dictionary)
    raise PlanError(f"window aggregate '{f}' not implemented")
