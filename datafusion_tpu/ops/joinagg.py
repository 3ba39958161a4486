"""Fused cross-join aggregation (CrossJoinAggExec).

Reference: /root/reference/datafusion/src/cube_ext/joinagg.rs:201
(CrossJoinAggExec::execute, :239-270) — the reference streams right-side
record batches through `left_cross_join` and folds each joined batch into
row-wise accumulators so the full |L| x |R| cross product never
materializes.

TPU-native mechanism (SURVEY.md §7): the cross product is *tiled*.  The
smaller input stays whole in HBM; the larger is consumed in fixed-capacity
chunks.  One jitted XLA program per tile expands the [whole x chunk] pair
indices by arithmetic (no data movement beyond two gathers), evaluates the
join condition, compacts the survivors, and a partial aggregate folds the
tile into per-group state; tile states concat and one final aggregate
merges them.  Static chunk capacities mean every tile reuses the same
compiled program; peak memory is O(|small| * chunk), not O(|L| * |R|).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table, round_capacity
from ..types import Schema
from . import kernels as K
from .aggregate import HashAggregateExec, PhysAggExpr
from .base import ExecutionPlan
from .basic import concat_tables

# Target number of expanded pair rows per tile.  4M f64 rows = 32 MB per
# column buffer: large enough to saturate the VPU, small enough that a
# wide joined schema stays well under HBM.
TILE_ROWS = 1 << 22


class CrossJoinAggExec(ExecutionPlan):
    """Aggregate over a condition-filtered cross join, tiled.

    group_expr/aggr_expr/condition are physical expressions over the joined
    (left fields ++ right fields) schema, exactly as the reference plans
    them against the join schema (joinagg.rs:164-183)."""

    def __init__(
        self,
        left: ExecutionPlan,
        right: ExecutionPlan,
        condition,  # PhysicalExpr | None over the joined schema
        group_expr: list[tuple],
        aggr_expr: list[PhysAggExpr],
    ):
        super().__init__()
        self.left = left
        self.right = right
        self.condition = condition
        self.group_expr = group_expr
        self.aggr_expr = aggr_expr
        # partial/final pair reused across tiles (jit caches live on them)
        self._partial = HashAggregateExec("partial", group_expr, aggr_expr, None)
        pschema = self._partial.schema()
        from ..exprs.physical import PhysCol

        final_group = [
            (PhysCol(pschema.fields[i].name, i, pschema.fields[i].dtype), name)
            for i, (_, name) in enumerate(group_expr)
        ]
        self._final = HashAggregateExec("final", final_group, aggr_expr, None)
        self._tile_cache = {}

    def schema(self) -> Schema:
        return self._final.schema()

    def children(self):
        return [self.left, self.right]

    def with_new_children(self, c):
        return CrossJoinAggExec(
            c[0], c[1], self.condition, self.group_expr, self.aggr_expr
        )

    # ------------------------------------------------------------------
    def _execute(self) -> Table:
        lt = self.left.execute()
        rt = self.right.execute()

        # the smaller side is kept whole ("skewed left" in the reference:
        # the left side is eagerly collected and replicated per batch,
        # join.rs:241); the larger side is chunked.
        if lt.nrows <= rt.nrows:
            whole, big, whole_is_left = lt, rt, True
        else:
            whole, big, whole_is_left = rt, lt, False

        n_whole = max(whole.nrows, 1)
        # chunk capacity: floor power of two, at least one VPU tile row
        per = max(1, TILE_ROWS // n_whole)
        cc = 1 << (per.bit_length() - 1)
        cc = max(128, min(cc, big.capacity))
        out_cap = round_capacity(n_whole * cc)
        nchunks = max(1, -(-big.nrows // cc))
        self.metrics.counter("tiles").add(nchunks)

        fn = self._tile_fn(whole, big, whole_is_left, cc, out_cap, n_whole)

        tiles = []
        for ci in range(nchunks):
            start = ci * cc
            n_chunk = min(cc, max(big.nrows - start, 0))
            out_d, out_v, cnt = fn(
                tuple(c.data for c in whole.columns),
                tuple(c.valid for c in whole.columns),
                np.int64(whole.nrows),
                tuple(c.data for c in big.columns),
                tuple(c.valid for c in big.columns),
                np.int64(start),
                np.int64(n_chunk),
            )
            names, dtypes, dicts = self._joined_meta(whole, big, whole_is_left)
            cols = [
                Column(dt, d, v, dic)
                for dt, dic, d, v in zip(dtypes, dicts, out_d, out_v)
            ]
            tile = Table(names, cols, int(cnt))
            self.metrics.counter("matched_rows").add(tile.nrows)
            tgt = round_capacity(tile.nrows)
            if tgt < tile.capacity:
                tile = tile.with_capacity(tgt)
            tiles.append(self._partial._execute_raw_jit(tile))

        merged = tiles[0] if len(tiles) == 1 else concat_tables(
            tiles, self._partial.schema()
        )
        return self._final._execute_final(merged)

    # ------------------------------------------------------------------
    def _joined_meta(self, whole, big, whole_is_left):
        lt, rt = (whole, big) if whole_is_left else (big, whole)
        names = list(lt.names) + list(rt.names)
        dtypes = [c.dtype for c in lt.columns] + [c.dtype for c in rt.columns]
        dicts = [c.dictionary for c in lt.columns] + [
            c.dictionary for c in rt.columns
        ]
        return names, dtypes, dicts

    def _tile_fn(self, whole, big, whole_is_left, cc, out_cap, n_whole_static):
        key = (
            whole.capacity,
            big.capacity,
            whole_is_left,
            cc,
            out_cap,
            tuple(str(c.dtype) for c in whole.columns),
            tuple(str(c.dtype) for c in big.columns),
            tuple(id(c.dictionary) for c in whole.columns),
            tuple(id(c.dictionary) for c in big.columns),
        )
        fn = self._tile_cache.get(key)
        if fn is not None:
            return fn

        names, dtypes, dicts = self._joined_meta(whole, big, whole_is_left)
        n_left = len(whole.columns) if whole_is_left else len(big.columns)
        whole_cap = whole.capacity
        condition = self.condition

        def body(w_datas, w_valids, n_whole, b_datas, b_valids, start, n_chunk):
            # pair index r -> (whole row, chunk row)
            r = jnp.arange(out_cap)
            wi = jnp.minimum(r // cc, whole_cap - 1)
            ki = r % cc
            alive = (r // cc < n_whole) & (ki < n_chunk)

            # slice the chunk out of the big side, then expand both sides
            w_cols = [
                Column(dt, d[wi], v[wi] & alive, dic)
                for dt, dic, d, v in zip(
                    dtypes if whole_is_left else dtypes[n_left:],
                    dicts if whole_is_left else dicts[n_left:],
                    w_datas,
                    w_valids,
                )
            ]
            b_cols = []
            for j, (d, v) in enumerate(zip(b_datas, b_valids)):
                dt = (dtypes[n_left:] if whole_is_left else dtypes)[j]
                dic = (dicts[n_left:] if whole_is_left else dicts)[j]
                cd = jax.lax.dynamic_slice_in_dim(d, start, cc)
                cv = jax.lax.dynamic_slice_in_dim(v, start, cc)
                b_cols.append(Column(dt, cd[ki], cv[ki] & alive, dic))

            cols = (w_cols + b_cols) if whole_is_left else (b_cols + w_cols)
            view = Table(list(names), cols, 0)

            keep = alive
            if condition is not None:
                pred = condition.evaluate(view)
                keep = keep & pred.data.astype(bool) & pred.valid

            datas = tuple(c.data for c in cols)
            valids = tuple(c.valid for c in cols)
            # live tile rows are interleaved (dead pair slots wherever the
            # chunk is short), so every position is eligible: `keep` already
            # folds the pair-aliveness mask in.
            return K.filter_compact(datas, valids, keep, jnp.int64(out_cap))

        fn = jax.jit(body)
        self._tile_cache[key] = fn
        return fn

    def _display_line(self):
        return (
            f"CrossJoinAggExec: on {self.condition!r}, "
            f"group={[n for _, n in self.group_expr]}, aggr={self.aggr_expr}"
        )
