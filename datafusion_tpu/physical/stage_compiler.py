"""Whole-stage compilation: fuse a linear operator chain into ONE jitted XLA
program.

The reference streams batches through per-operator async tasks; on TPU the
equivalent performance move is the opposite — trace the whole
Scan -> Filter/Projection -> Aggregate pipeline into a single XLA program so
the compiler fuses expression evaluation into the reductions and the host
dispatches once per stage (SURVEY.md §7: "a host-side Python driver walks
the physical plan and dispatches jitted stage functions").

Also implements the small-domain GROUP BY fast path: when every group key is
a dictionary/bool column whose domain product is small (TPC-H Q1's
returnflag x linestatus = 6), group ids come from direct radix arithmetic
(key_i * stride_i) with num_segments = domain product — no sort at all,
just segment reductions (the analogue of the reference's
GroupByScalar-on-small-keys specialization).

Stage boundaries: joins and sorts with data-dependent output capacities
stay host-driven; everything between them fuses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table, round_capacity
from ..errors import InternalError
from ..ops import kernels as K
from ..ops.aggregate import (
    HashAggregateExec,
    _eval_aggregate,
    _group_rows,
    _merge_aggregate,
    _segment_first_index,
)
from ..ops.base import ExecutionPlan
from ..ops.basic import FilterExec, MemoryExec, ProjectionExec
from ..ops.sort import SortExec

SMALL_DOMAIN_LIMIT = 4096


def compilable(plan: ExecutionPlan) -> bool:
    """Is this subtree one fusable stage (Memory -> Filter/Proj -> [Agg])?"""
    node = plan
    if isinstance(node, HashAggregateExec) and node.mode in ("single", "partial"):
        node = node.input
    while isinstance(node, (FilterExec, ProjectionExec)):
        node = node.input
    return isinstance(node, MemoryExec)


class CompiledStage:
    """One fused stage: fn(datas, valids, nrows) -> (datas, valids, nout)."""

    def __init__(self, plan: ExecutionPlan):
        self.plan = plan
        # linearize
        chain = []
        node = plan
        while not isinstance(node, MemoryExec):
            chain.append(node)
            node = node.children()[0]
        self.source: MemoryExec = node
        self.chain = list(reversed(chain))
        self.out_schema = plan.schema()
        self._jitted = jax.jit(self._run)
        # learn output dictionaries from a dry evaluation
        self.out_dicts = self._infer_dicts()

    # ------------------------------------------------------------------
    def execute(self) -> Table:
        src = self.source.execute()
        datas = tuple(c.data for c in src.columns)
        valids = tuple(c.valid for c in src.columns)
        out_d, out_v, nout = self._jitted(datas, valids, np.int64(src.nrows))
        cols = [
            Column(f.dtype, d, v, dic)
            for f, d, v, dic in zip(self.out_schema.fields, out_d, out_v, self.out_dicts)
        ]
        t = Table(self.out_schema.names(), cols, int(nout))
        tgt = round_capacity(t.nrows)
        if tgt < t.capacity:
            t = t.with_capacity(tgt)
        return t

    # ------------------------------------------------------------------
    def _table_view(self, datas, valids, base: Table) -> Table:
        cols = [
            Column(c.dtype, d, v, c.dictionary)
            for c, d, v in zip(base.columns, datas, valids)
        ]
        return Table(list(base.names), cols, 0)

    def _infer_dicts(self):
        src = self.source.execute()
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
            elif isinstance(op, FilterExec):
                pass
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
    def _run(self, datas, valids, nrows):
        src_table = self._table_view(datas, valids, self.source.execute())
        t = src_table
        cur_d = list(datas)
        cur_v = list(valids)
        cap = cur_d[0].shape[0] if cur_d else 0
        n = nrows

        for op in self.chain:
            if isinstance(op, FilterExec):
                view = self._table_view(cur_d, cur_v, t)
                p = op.predicate.evaluate(view)
                keep = p.data.astype(bool) & p.valid & (jnp.arange(cap) < n)
                pos = jnp.cumsum(keep) - 1
                tgt = jnp.where(keep, pos, cap)
                cur_d = [
                    jnp.zeros_like(d).at[tgt].set(d, mode="drop") for d in cur_d
                ]
                cur_v = [
                    jnp.zeros_like(v).at[tgt].set(v & keep, mode="drop")
                    for v in cur_v
                ]
                n = jnp.sum(keep)
            elif isinstance(op, ProjectionExec):
                view = self._table_view(cur_d, cur_v, t)
                outs = [e.evaluate(view) for e, _ in op.exprs]
                cur_d = [c.data for c in outs]
                cur_v = [c.valid for c in outs]
                t = Table([nm for _, nm in op.exprs], outs, 0)
            elif isinstance(op, HashAggregateExec):
                view = self._table_view(cur_d, cur_v, t)
                cur_d, cur_v, n = _traced_aggregate(op, view, n, cap)
            else:  # pragma: no cover
                raise InternalError(f"unfusable op {type(op).__name__}")
        return tuple(cur_d), tuple(cur_v), n


def _small_domain(key_cols) -> int | None:
    """Total direct-index domain if all keys are small dictionary/bool."""
    total = 1
    for c in key_cols:
        if c.dtype.is_string and c.dictionary is not None:
            total *= max(len(c.dictionary), 1) + 1  # +1 for NULL slot
        elif c.dtype.is_bool:
            total *= 3
        else:
            return None
        if total > SMALL_DOMAIN_LIMIT:
            return None
    return total


def _traced_aggregate(op: HashAggregateExec, t: Table, nrows, cap):
    key_cols = [e.evaluate(t) for e, _ in op.group_expr]
    alive = jnp.arange(cap) < nrows

    domain = _small_domain(key_cols) if key_cols else None
    if domain is not None:
        # direct-index grouping: gid = sum(code_i * stride_i); groups then
        # compacted to the front in key-sorted order (codes are sorted
        # dictionary indices, so arithmetic order == lexicographic order)
        gid = jnp.zeros(cap, jnp.int32)
        stride = 1
        for c in reversed(key_cols):
            base = max(len(c.dictionary), 1) + 1 if c.dtype.is_string else 3
            code = jnp.where(c.valid, c.data.astype(jnp.int32) + 1, 0)
            gid = gid + code * stride
            stride *= base
        gid = jnp.where(alive, gid, domain)
        occupied = jnp.zeros(domain + 1, bool).at[gid].set(alive, mode="drop")[
            :domain
        ]
        # dense rank of occupied slots; compact groups to the front
        dense = jnp.cumsum(occupied) - 1
        ngroups = jnp.sum(occupied)
        out_gid = jnp.where(
            alive, dense[jnp.clip(gid, 0, domain - 1)], cap - 1
        )
        # representative row per group slot
        first_idx = (
            jnp.full(domain, cap - 1, jnp.int32)
            .at[jnp.clip(gid, 0, domain - 1)]
            .min(jnp.where(alive, jnp.arange(cap, dtype=jnp.int32), cap - 1), mode="drop")
        )
        # gather group keys into compacted group order
        slot_of_group = (
            jnp.full(domain, 0, jnp.int32)
            .at[jnp.clip(dense, 0, domain - 1)]
            .max(jnp.where(occupied, jnp.arange(domain, dtype=jnp.int32), 0), mode="drop")
        )
        # first row index per *compacted* group
        first_per_group = first_idx[
            jnp.clip(slot_of_group, 0, domain - 1)
        ]
        out_d, out_v = [], []
        gvalid_row = jnp.arange(cap) < ngroups
        src = jnp.clip(first_per_group, 0, cap - 1)
        for c in key_cols:
            out_d.append(_pad_to(c.data[src], cap, c.data.dtype))
            out_v.append(_pad_to(c.valid[src], cap, jnp.bool_) & gvalid_row)
        identity = jnp.arange(cap)
        for a in op.aggr_expr:
            cols = _eval_aggregate(
                a,
                t,
                identity,
                out_gid,
                cap,
                alive,
                ngroups,
                emit_state=(op.mode == "partial"),
            )
            for c in cols:
                out_d.append(c.data)
                out_v.append(c.valid)
        return out_d, out_v, ngroups

    # general path: sort-based grouping (same as HashAggregateExec, traced)
    if key_cols:
        perm, gid, ngroups, sorted_keys = _group_rows(key_cols, nrows)
    else:
        perm = jnp.arange(cap)
        gid = jnp.where(alive, 0, cap - 1)
        ngroups = jnp.int64(1)
        sorted_keys = []
    alive_sorted = jnp.arange(cap) < nrows
    out_d, out_v = [], []
    for kc, (skd, skv) in zip(key_cols, sorted_keys):
        fi = _segment_first_index(gid, cap, alive_sorted)
        out_d.append(skd[fi])
        out_v.append(skv[fi] & (jnp.arange(cap) < ngroups))
    for a in op.aggr_expr:
        cols = _eval_aggregate(
            a, t, perm, gid, cap, alive_sorted, ngroups,
            emit_state=(op.mode == "partial"),
        )
        for c in cols:
            out_d.append(c.data)
            out_v.append(c.valid)
    return out_d, out_v, ngroups


def _pad_to(x, cap, dtype):
    n = x.shape[0]
    if n == cap:
        return x.astype(dtype)
    if n > cap:
        return x[:cap].astype(dtype)
    return jnp.concatenate([x.astype(dtype), jnp.zeros(cap - n, dtype)])
