"""HashAggregateExec equivalent: sort/segment-based vectorized GROUP BY.

Reference: /root/reference/datafusion/src/physical_plan/hash_aggregate.rs
(1,860 LoC) — hashbrown raw-entry map keyed on encoded GroupByScalar rows,
per-group Accumulator objects, modes Partial/Final/Full/FinalPartitioned
(:90-106), row-by-row `group_aggregate_batch` hot loop (:409).

TPU-native design (SURVEY.md §7): no hash table at all on-device.  Rows are
lexicographically sorted by their (order-isomorphic int64) group keys with
XLA's stable sort, group ids come from boundary detection + cumsum, and every
aggregate becomes a segment reduction — deterministic order, fully
vectorized, O(n log n) with n = whole-buffer rows.  Two-phase distributed
aggregation (Partial -> shuffle by key -> Final) reuses the same kernel with
merge semantics on the partial state columns, mirroring the reference's
Partial/FinalPartitioned split (planner.rs:526-601).

Aggregate state layout (partial columns per logical aggregate):
  count       -> [count:i64]                 final: sum
  sum         -> [sum:T, count:i64]          final: sum (count tracks null-ness)
  min/max     -> [min:T, count:i64]          final: min/max
  avg         -> [sum:f64, count:i64]        final: sum/count
  var/stddev  -> [n:i64, sum:f64, sumsq:f64] final: moments
  covar/corr  -> [n, sx, sy, sxy, sxx, syy]  final: moments
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table, round_capacity
from ..errors import InternalError, PlanError
from ..exprs.physical import PhysicalExpr, cast_column
from ..types import Field, Schema
from ..types.dtypes import (
    BOOL,
    DataType,
    FLOAT64,
    INT64,
    UINT64,
)
from ..functions.aggregates import aggregate_return_type
from . import kernels as K
from .base import ExecutionPlan


class PhysAggExpr:
    """One aggregate: function name + input expression (+ distinct flag)."""

    def __init__(
        self,
        fun: str,
        expr: PhysicalExpr | None,
        name: str,
        distinct: bool = False,
        udf=None,
    ):
        self.fun = fun.lower()
        if self.fun == "mean":
            self.fun = "avg"
        if self.fun == "approx_distinct":
            # hyperloglog_expressions.rs equivalent: exact distinct count is
            # a valid (and on this engine, cheap sort-based) approximation
            self.fun = "count"
            distinct = True
        self.expr = expr  # None => COUNT(*)
        self.name = name
        self.distinct = distinct
        self.udf = udf  # functions.udf.AggregateUDF when user-defined

    def return_type(self) -> DataType:
        if self.udf is not None:
            return self.udf.return_type
        if self.expr is None:
            return INT64
        return aggregate_return_type(self.fun, [self.expr.dtype])

    # ---- partial state schema ------------------------------------------------
    def state_fields(self) -> list[tuple[str, DataType]]:
        rt = self.return_type()
        f = self.fun
        if self.udf is not None:
            # one monoid accumulator + count (udaf.rs state_type)
            return [(f"{self.name}[acc]", rt), (f"{self.name}[count]", INT64)]
        if f == "count":
            return [(f"{self.name}[count]", INT64)]
        if f == "sum":
            return [(f"{self.name}[sum]", rt), (f"{self.name}[count]", INT64)]
        if f in ("min", "max"):
            t = self.expr.dtype
            return [(f"{self.name}[{f}]", t), (f"{self.name}[count]", INT64)]
        if f == "avg":
            return [(f"{self.name}[sum]", FLOAT64), (f"{self.name}[count]", INT64)]
        if f in ("variance", "var", "var_samp", "var_pop", "stddev", "stddev_samp", "stddev_pop"):
            return [
                (f"{self.name}[n]", INT64),
                (f"{self.name}[sum]", FLOAT64),
                (f"{self.name}[sumsq]", FLOAT64),
            ]
        if f in ("covar", "covar_samp", "covar_pop", "corr"):
            return [
                (f"{self.name}[n]", INT64),
                (f"{self.name}[sx]", FLOAT64),
                (f"{self.name}[sy]", FLOAT64),
                (f"{self.name}[sxy]", FLOAT64),
                (f"{self.name}[sxx]", FLOAT64),
                (f"{self.name}[syy]", FLOAT64),
            ]
        raise PlanError(f"aggregate '{self.fun}' not supported")

    def __repr__(self):
        d = "DISTINCT " if self.distinct else ""
        arg = repr(self.expr) if self.expr is not None else "*"
        return f"{self.fun}({d}{arg})"


class HashAggregateExec(ExecutionPlan):
    """mode: 'single' | 'partial' | 'final'.

    single : raw rows in, final values out
    partial: raw rows in, state columns out (for shuffle)
    final  : state columns in (schema = group keys + state), final values out

    DISTINCT aggregates cannot ship scalar partial states (a per-partition
    distinct count over-counts values seen on several partitions — the
    reference keeps the value SET as state, distinct_expressions.rs).  The
    split (build_distinct_partial_final) instead has the partial phase
    group by (keys + distinct value exprs) — emitting the DEDUP'D PAIRS as
    rows — and the final phase (``distinct_values`` > 0) re-deduplicates
    values cross-partition per group before aggregating them, while
    non-distinct states merge normally.  Final input layout with
    distinct_values=k: [group keys..., dv_0..dv_{k-1}, states...]."""

    def __init__(
        self,
        mode: str,
        group_expr: list[tuple[PhysicalExpr, str]],
        aggr_expr: list[PhysAggExpr],
        input: ExecutionPlan,
        distinct_values: int = 0,
    ):
        super().__init__()
        if mode not in ("single", "partial", "final"):
            raise InternalError(f"bad aggregate mode {mode}")
        self.mode = mode
        self.group_expr = group_expr
        self.aggr_expr = aggr_expr
        self.input = input
        self.distinct_values = distinct_values
        if distinct_values and mode != "final":
            raise InternalError("distinct_values only applies to final mode")

    def schema(self) -> Schema:
        fields = [Field(name, e.dtype, True) for e, name in self.group_expr]
        if self.mode == "partial":
            for a in self.aggr_expr:
                for sname, sdt in a.state_fields():
                    fields.append(Field(sname, sdt, True))
        else:
            for a in self.aggr_expr:
                fields.append(Field(a.name, a.return_type(), True))
        return Schema(fields)

    def children(self):
        return [self.input]

    def with_new_children(self, c):
        return HashAggregateExec(
            self.mode, self.group_expr, self.aggr_expr, c[0], self.distinct_values
        )

    # ------------------------------------------------------------------
    def _execute(self) -> Table:
        t = self.input.execute()
        if self.mode == "final":
            return self._execute_final(t)
        return self._execute_raw_jit(t)

    # ---- jitted raw path: ONE device program per aggregate op ------------
    # (the eager path below dispatches dozens of ops; post-join aggregates
    # are latency-bound on dispatch, so trace the whole thing like the
    # fused-stage compiler does)
    def _execute_raw_jit(self, t: Table) -> Table:
        from ..physical.stage_compiler import _agg_out_meta, _traced_aggregate

        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        key = (
            t.capacity,
            tuple(str(c.dtype) for c in t.columns),
            tuple(id(c.dictionary) for c in t.columns),
        )
        entry = self._jit_cache.get(key)
        if entry is None:
            names = list(t.names)
            dtypes = [c.dtype for c in t.columns]
            dicts = [c.dictionary for c in t.columns]

            def body(datas, valids, nrows):
                cols = [
                    Column(dt, d, v, dic)
                    for dt, dic, d, v in zip(dtypes, dicts, datas, valids)
                ]
                view = Table(list(names), cols, 0)
                cap = t.capacity
                alive = jnp.arange(cap) < nrows
                out_d, out_v, n, _meta = _traced_aggregate(self, view, alive, cap)
                return tuple(out_d), tuple(out_v), n

            # output metadata from a 1-row dry evaluation (host side)
            sample = Table(
                list(names),
                [
                    Column(dt, jnp.zeros(1, c.data.dtype), jnp.zeros(1, bool), dic)
                    for dt, dic, c in zip(dtypes, dicts, t.columns)
                ],
                0,
            )
            key_cols = [e.evaluate(sample) for e, _ in self.group_expr]
            meta = _agg_out_meta(self, key_cols, self.mode == "partial")
            if self.mode != "partial":
                for a in self.aggr_expr:
                    if a.fun in ("min", "max") and a.expr is not None:
                        dic = a.expr.evaluate(sample).dictionary
                        meta = [
                            (nm, dt, dic if nm == a.name else d0)
                            for nm, dt, d0 in meta
                        ]
            entry = (jax.jit(body), meta)
            self._jit_cache[key] = entry

        fn, meta = entry
        out_d, out_v, n = fn(
            tuple(c.data for c in t.columns),
            tuple(c.valid for c in t.columns),
            t.nrows_dev,
        )
        cols = [
            Column(dt, d, v, dic)
            for (nm, dt, dic), d, v in zip(meta, out_d, out_v)
        ]
        out = Table([nm for nm, _, _ in meta], cols, int(n))
        # capacity RATCHET across repeated executions (morsel loops call
        # this once per morsel): per-morsel group counts jitter between
        # round_capacity buckets, and every distinct output capacity is a
        # distinct compiled program for every downstream operator — pin
        # the output to the largest capacity seen so shapes stabilize
        tgt = max(
            round_capacity(out.nrows), getattr(self, "_out_cap_ratchet", 0)
        )
        self._out_cap_ratchet = tgt
        if tgt != out.capacity:
            out = out.with_capacity(tgt)
        return out

    # ---- phase 2: merge state columns ------------------------------------
    def _execute_final(self, t: Table) -> Table:
        cap = t.capacity
        nrows = t.nrows_dev
        nkeys = len(self.group_expr)
        key_cols = t.columns[:nkeys]

        if key_cols:
            # ONE group sort carrying every state column as payload
            # (kernels.py co-sorting note): no perm gathers afterwards
            ordkeys = tuple(K.orderable_key(c.data, c.dtype, c.vrange) for c in key_cols)
            kvalids = tuple(c.valid for c in key_cols)
            nc = len(t.columns)
            payloads = (
                tuple(c.data for c in t.columns)
                + tuple(c.valid for c in t.columns)
                + ordkeys
            )
            moved, _ = K.lexsort_apply(
                ordkeys,
                kvalids,
                payloads,
                nrows,
                tuple(False for _ in key_cols),
                tuple(True for _ in key_cols),
            )
            s_data = moved[:nc]
            s_valid = moved[nc : 2 * nc]
            s_ord = moved[2 * nc :]
            gid, ngroups_dev = K.group_ids_sorted(
                s_ord, tuple(s_valid[:nkeys]), nrows
            )
            ngroups = int(ngroups_dev)
            sorted_cols = [
                Column(c.dtype, d, v, c.dictionary)
                for c, d, v in zip(t.columns, s_data, s_valid)
            ]
        else:
            gid = jnp.where(jnp.arange(cap) < nrows, 0, cap - 1)
            ngroups = 1
            sorted_cols = list(t.columns)

        alive_sorted = jnp.arange(cap) < nrows

        names = [n for _, n in self.group_expr]
        out_cols: list[Column] = []
        if key_cols:
            fi = _segment_first_index(gid, cap, alive_sorted).astype(jnp.int32)
            gv = jnp.arange(cap) < ngroups
            kd, kv, _ = K.take_rows(
                tuple(sc.data for sc in sorted_cols[:nkeys]),
                tuple(sc.valid for sc in sorted_cols[:nkeys]),
                fi,
            )
            for kc, d, v in zip(key_cols, kd, kv):
                out_cols.append(Column(kc.dtype, d, v & gv, kc.dictionary))

        # input layout: [keys..., distinct value cols..., state cols...];
        # distinct aggs re-aggregate their (cross-partition re-deduplicated)
        # raw values, non-distinct aggs merge partial states
        ndv = self.distinct_values

        def _merge_loop():
            idx = nkeys + ndv
            dvi = 0
            acc = []
            for a in self.aggr_expr:
                if ndv and a.distinct:
                    dv_col = sorted_cols[nkeys + dvi]
                    dvi += 1
                    acc.append(_final_distinct_over_values(
                        a, dv_col, gid, cap, alive_sorted, ngroups
                    ))
                else:
                    nstate = len(a.state_fields())
                    state_cols = sorted_cols[idx : idx + nstate]
                    idx += nstate
                    acc.append(_merge_aggregate(
                        a, state_cols, None, gid, cap, alive_sorted, ngroups
                    ))
            return acc

        for a, merged in zip(self.aggr_expr, K.seg_batch(_merge_loop)):
            names.append(a.name)
            out_cols.append(merged)

        out = Table(names, out_cols, ngroups)
        tgt = round_capacity(ngroups)
        if tgt < out.capacity:
            out = out.with_capacity(tgt)
        return out

    def _display_line(self):
        return (
            f"HashAggregateExec[{self.mode}]: "
            f"group={[n for _, n in self.group_expr]}, aggr={self.aggr_expr}"
        )


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _group_rows(key_cols, nrows):
    """Sort rows by group keys; return (perm, gid, ngroups, sorted key bufs)."""
    ordkeys = tuple(K.orderable_key(c.data, c.dtype, c.vrange) for c in key_cols)
    valids = tuple(c.valid for c in key_cols)
    perm = K.lexsort_perm(
        ordkeys,
        valids,
        nrows,
        tuple(False for _ in key_cols),
        tuple(True for _ in key_cols),
    )
    perm32 = perm.astype(jnp.int32)
    sorted_data = tuple(K.gather64(c.data, perm32) for c in key_cols)
    sorted_valid = tuple(v[perm32] for v in valids)
    sorted_ord = tuple(K.gather64(k, perm32) for k in ordkeys)
    gid, ngroups = K.group_ids_sorted(sorted_ord, sorted_valid, nrows)
    return perm, gid, ngroups, list(zip(sorted_data, sorted_valid))


def _segment_first_index(gid, cap, alive):
    """Index (into sorted order) of the first row of each segment.

    gid is sorted/dense, so segment s's first row is the s-th boundary
    position — one stable bool sort, no scatter (entries past the real
    segment count are garbage; callers mask by ngroups)."""
    first_pos, _ = K._segment_positions(gid)
    return first_pos


def _prepare_value(col: Column):
    """Aggregation input as numeric array + valid mask."""
    return col.data, col.valid


def _eval_aggregate(a: PhysAggExpr, t: Table, perm, gid, cap, alive, ngroups, emit_state: bool):
    """Compute one aggregate over sorted/grouped rows.

    Returns list of state Columns (emit_state) or [final Column]."""
    f = a.fun
    if a.distinct and f not in ("count", "sum", "avg", "min", "max"):
        raise PlanError(f"DISTINCT not supported for {f}")

    if a.expr is None:  # COUNT(*)
        cnt = K.segment_sum(alive.astype(jnp.int64), gid, cap)
        col = Column(INT64, cnt, jnp.arange(cap) < ngroups)
        return [col]

    v = a.expr.evaluate(t)
    if perm is None:
        # the table is already in group-sorted order (its columns rode the
        # group sort as payloads) — no gathers at all
        data = v.data
        valid = v.valid & alive
    else:
        perm32 = perm.astype(jnp.int32)
        data = K.gather64(v.data, perm32)
        valid = v.valid[perm32] & alive

    if a.distinct:
        # mask duplicate (group, value) pairs so each distinct value counts once
        data, valid = _distinct_mask(v, perm, gid, data, valid, cap)

    gvalid = jnp.arange(cap) < ngroups

    if a.udf is not None:
        # user-defined monoid: segmented scan with the UDAF's step
        rt = a.return_type()
        sdt = rt.storage_np_dtype()
        x = jnp.where(valid, data.astype(sdt), sdt.type(a.udf.zero))
        acc = K._boundary_read(
            gid, lambda: K._segment_scan(x, gid, a.udf.step), "last"
        )
        cnt = K.segment_sum(valid.astype(jnp.int64), gid, cap)
        if emit_state:
            return [Column(rt, acc, gvalid), Column(INT64, cnt, gvalid)]
        out = acc if a.udf.finalize is None else a.udf.finalize(acc, cnt)
        return [Column(rt, out.astype(sdt), gvalid & (cnt > 0))]

    if f == "count":
        cnt = K.segment_sum(valid.astype(jnp.int64), gid, cap)
        return [Column(INT64, cnt, gvalid)]

    if f == "sum":
        rt = a.return_type()
        acc = data.astype(rt.storage_np_dtype())
        s = K.segment_sum(jnp.where(valid, acc, 0), gid, cap)
        cnt = K.segment_sum(valid.astype(jnp.int64), gid, cap)
        sum_col = Column(rt, s, gvalid & (cnt > 0))
        if emit_state:
            return [sum_col, Column(INT64, cnt, gvalid)]
        return [sum_col]

    if f in ("min", "max"):
        t_in = v.dtype
        ordk = K.orderable_key(data, t_in, getattr(v, 'vrange', None))
        if t_in.is_float:
            neutral = jnp.inf if f == "min" else -jnp.inf
            vals = jnp.where(valid, data, neutral)
            red = K.segment_min(vals, gid, cap) if f == "min" else K.segment_max(vals, gid, cap)
            out_data = red.astype(t_in.storage_np_dtype())
        else:
            big = jnp.asarray(
                jnp.iinfo(ordk.dtype).max if f == "min" else jnp.iinfo(ordk.dtype).min,
                ordk.dtype,
            )
            vals = jnp.where(valid, ordk, big)
            red = K.segment_min(vals, gid, cap) if f == "min" else K.segment_max(vals, gid, cap)
            out_data = red.astype(t_in.storage_np_dtype())
        cnt = K.segment_sum(valid.astype(jnp.int64), gid, cap)
        col = Column(t_in, out_data, gvalid & (cnt > 0), v.dictionary)
        if emit_state:
            return [col, Column(INT64, cnt, gvalid)]
        return [col]

    if f == "avg":
        fd = _to_float(data, v.dtype)
        s = K.segment_sum(jnp.where(valid, fd, 0.0), gid, cap)
        cnt = K.segment_sum(valid.astype(jnp.int64), gid, cap)
        if emit_state:
            return [Column(FLOAT64, s, gvalid), Column(INT64, cnt, gvalid)]
        mean = s / jnp.maximum(cnt, 1)
        return [Column(FLOAT64, mean, gvalid & (cnt > 0))]

    if f in ("variance", "var", "var_samp", "var_pop", "stddev", "stddev_samp", "stddev_pop"):
        fd = _to_float(data, v.dtype)
        n = K.segment_sum(valid.astype(jnp.int64), gid, cap)
        s = K.segment_sum(jnp.where(valid, fd, 0.0), gid, cap)
        ss = K.segment_sum(jnp.where(valid, fd * fd, 0.0), gid, cap)
        if emit_state:
            return [
                Column(INT64, n, gvalid),
                Column(FLOAT64, s, gvalid),
                Column(FLOAT64, ss, gvalid),
            ]
        return [_finalize_var(f, n, s, ss, gvalid)]

    raise PlanError(f"aggregate '{f}' not implemented")


def _final_distinct_over_values(a: PhysAggExpr, dv_col, gid, cap, alive, ngroups):
    """Final phase of a DISTINCT aggregate: the partial phase shipped the
    deduplicated VALUES (not scalar states), so re-deduplicate per group —
    values seen on several partitions arrive several times — and aggregate
    the survivors exactly like the single-node distinct path."""
    from ..exprs.physical import PhysCol

    shim = PhysAggExpr(
        a.fun, PhysCol("__dv", 0, dv_col.dtype), a.name, distinct=True
    )
    t = Table(["__dv"], [dv_col], 0)
    return _eval_aggregate(
        shim, t, None, gid, cap, alive, ngroups, emit_state=False
    )[0]


def _distinct_mask(v, perm, gid, data, valid, cap):
    """Keep the first occurrence of each (group, value) pair; null out rest.

    Sorts rows by (gid, value) and detects boundaries — same primitive as
    grouping itself (the reference uses per-group HashSets,
    distinct_expressions.rs)."""
    ordv = K.orderable_key(data, v.dtype)
    sentinel = (
        jnp.inf
        if jnp.issubdtype(ordv.dtype, jnp.floating)
        else jnp.asarray(jnp.iinfo(ordv.dtype).max, ordv.dtype)
    )
    order = jnp.argsort(jnp.where(valid, ordv, sentinel), stable=True)
    order = order[jnp.argsort(gid[order], stable=True)]
    g2 = gid[order]
    d2 = ordv[order]
    va2 = valid[order]
    prev_same = (
        (g2 == jnp.roll(g2, 1)) & (d2 == jnp.roll(d2, 1)) & (va2 & jnp.roll(va2, 1))
    )
    prev_same = prev_same.at[0].set(False)
    keep = va2 & ~prev_same
    # inverse-permutation application WITHOUT a cap-sized scatter: co-sort
    # (order, keep) by order — payload keep[i] lands at position order[i]
    # (bench/MICRO.md rule 1/7)
    _, (keep_unsorted,) = K.cosort((order,), (keep,))
    return data, valid & keep_unsorted


def _merge_aggregate(a: PhysAggExpr, state_cols, perm, gid, cap, alive, ngroups):
    """Final phase: reduce partial state columns into final values."""
    f = a.fun
    gvalid = jnp.arange(cap) < ngroups

    def sort_col(c):
        if perm is None:  # column already rode the group sort
            return c.data, c.valid & alive
        p32 = perm.astype(jnp.int32)
        return K.gather64(c.data, p32), c.valid[p32] & alive

    if a.udf is not None:
        rt = a.return_type()
        sdt = rt.storage_np_dtype()
        d, _ = sort_col(state_cols[0])
        c, cv = sort_col(state_cols[1])
        x = jnp.where(cv & (c > 0), d.astype(sdt), sdt.type(a.udf.zero))
        acc = K._boundary_read(
            gid, lambda: K._segment_scan(x, gid, a.udf.step), "last"
        )
        cnt = K.segment_sum(jnp.where(cv, c, 0), gid, cap)
        out = acc if a.udf.finalize is None else a.udf.finalize(acc, cnt)
        return Column(rt, out.astype(sdt), gvalid & (cnt > 0))

    if a.expr is None or f == "count":
        d, va = sort_col(state_cols[0])
        s = K.segment_sum(jnp.where(va, d, 0), gid, cap)
        return Column(INT64, s, gvalid)
    if f == "sum":
        rt = a.return_type()
        d, _ = sort_col(state_cols[0])
        c, cv = sort_col(state_cols[1])
        s = K.segment_sum(jnp.where(cv, d, 0).astype(rt.storage_np_dtype()), gid, cap)
        cnt = K.segment_sum(jnp.where(cv, c, 0), gid, cap)
        return Column(rt, s, gvalid & (cnt > 0))
    if f in ("min", "max"):
        t_in = state_cols[0].dtype
        d, _ = sort_col(state_cols[0])
        c, cv = sort_col(state_cols[1])
        has = cv & (c > 0)
        if t_in.is_float:
            neutral = jnp.inf if f == "min" else -jnp.inf
            vals = jnp.where(has, d, neutral)
            red = K.segment_min(vals, gid, cap) if f == "min" else K.segment_max(vals, gid, cap)
            out = red.astype(t_in.storage_np_dtype())
        else:
            ordk = K.orderable_key(d, t_in)
            big = jnp.asarray(
                jnp.iinfo(ordk.dtype).max if f == "min" else jnp.iinfo(ordk.dtype).min,
                ordk.dtype,
            )
            vals = jnp.where(has, ordk, big)
            red = K.segment_min(vals, gid, cap) if f == "min" else K.segment_max(vals, gid, cap)
            out = red.astype(t_in.storage_np_dtype())
        cnt = K.segment_sum(jnp.where(cv, c, 0), gid, cap)
        return Column(t_in, out, gvalid & (cnt > 0), state_cols[0].dictionary)
    if f == "avg":
        d, _ = sort_col(state_cols[0])
        c, cv = sort_col(state_cols[1])
        s = K.segment_sum(jnp.where(cv, d, 0.0), gid, cap)
        cnt = K.segment_sum(jnp.where(cv, c, 0), gid, cap)
        return Column(FLOAT64, s / jnp.maximum(cnt, 1), gvalid & (cnt > 0))
    if f in ("variance", "var", "var_samp", "var_pop", "stddev", "stddev_samp", "stddev_pop"):
        n, nv = sort_col(state_cols[0])
        s, _ = sort_col(state_cols[1])
        ss, _ = sort_col(state_cols[2])
        N = K.segment_sum(jnp.where(nv, n, 0), gid, cap)
        S = K.segment_sum(jnp.where(nv, s, 0.0), gid, cap)
        SS = K.segment_sum(jnp.where(nv, ss, 0.0), gid, cap)
        return _finalize_var(f, N, S, SS, gvalid)
    raise PlanError(f"merge for aggregate '{f}' not implemented")


def _finalize_var(f, n, s, ss, gvalid):
    nf = n.astype(jnp.float64)
    mean = s / jnp.maximum(nf, 1.0)
    m2 = ss - nf * mean * mean
    pop = f.endswith("_pop")
    denom = jnp.maximum(nf if pop else nf - 1.0, 1.0)
    var = m2 / denom
    var = jnp.maximum(var, 0.0)
    if f.startswith("stddev"):
        out = jnp.sqrt(var)
    else:
        out = var
    min_n = 1 if pop else 2
    return Column(FLOAT64, out, gvalid & (n >= min_n))


def _to_float(data, dtype):
    if dtype.is_decimal:
        return data.astype(jnp.float64) / (10**dtype.scale)
    return data.astype(jnp.float64)
