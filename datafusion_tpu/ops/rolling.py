"""RollingWindowAggExec: dense-grid rolling aggregates.

Reference: /root/reference/datafusion/src/cube_ext/rolling.rs:359
(RollingWindowAggExec) — the CubeStore ROLLING_WINDOW extension.  The
reference walks per-partition cursors over sorted batches; here the grid is
materialized directly:

  1. bucket = (dimension - FROM) / EVERY per row (grid index)
  2. one pass builds per-(partition, bucket) partial aggregates into a
     dense [nparts, nbuckets] matrix (nbuckets is static from the
     FROM/TO/EVERY literals — XLA-friendly shapes)
  3. rolling windows reduce along the bucket axis with prefix sums
     (sum/count/avg) or cumulative min/max — O(nbuckets) work per
     partition instead of the reference's per-row cursor loop
  4. output = nparts x nbuckets rows: partition keys, grid value, rolling
     values (+ unwindowed per-bucket aggregates for GROUP BY DIMENSION)

Offsets (RANGE k PRECEDING/FOLLOWING) must be multiples of EVERY.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table, round_capacity
from ..errors import PlanError
from ..types import Field, Schema
from ..types.dtypes import FLOAT64, INT64
from . import kernels as K
from .aggregate import PhysAggExpr, _group_rows, _segment_first_index, _to_float
from .base import ExecutionPlan


class PhysRollingAgg:
    def __init__(self, agg: PhysAggExpr, preceding: int | None, following: int):
        """preceding: buckets before the grid point (None = unbounded);
        following: buckets after (0 = current)."""
        self.agg = agg
        self.preceding = preceding
        self.following = following


class RollingWindowAggExec(ExecutionPlan):
    def __init__(
        self,
        input: ExecutionPlan,
        dimension,  # PhysicalExpr (column)
        dim_field: Field,
        from_v: int,
        to_v: int,
        every_v: int,
        partition_by: list,  # [(PhysicalExpr, name)]
        rolling_aggs: list[PhysRollingAgg],
        group_by_dimension=None,  # PhysicalExpr | None
        aggs: list[PhysAggExpr] | None = None,
    ):
        super().__init__()
        if every_v <= 0:
            raise PlanError("EVERY must be positive")
        if to_v < from_v:
            raise PlanError("TO is less than FROM")
        self.input = input
        self.dimension = dimension
        self.dim_field = dim_field
        self.from_v = int(from_v)
        self.to_v = int(to_v)
        self.every_v = int(every_v)
        self.partition_by = partition_by
        self.rolling_aggs = rolling_aggs
        self.group_by_dimension = group_by_dimension
        self.aggs = aggs or []
        self.nbuckets = (self.to_v - self.from_v) // self.every_v + 1

    def schema(self) -> Schema:
        fields = [Field(n, e.dtype, True) for e, n in self.partition_by]
        fields.append(self.dim_field)
        for r in self.rolling_aggs:
            fields.append(Field(r.agg.name, r.agg.return_type(), True))
        for a in self.aggs:
            fields.append(Field(a.name, a.return_type(), True))
        return Schema(fields)

    def children(self):
        return [self.input]

    def with_new_children(self, c):
        return RollingWindowAggExec(
            c[0], self.dimension, self.dim_field, self.from_v, self.to_v,
            self.every_v, self.partition_by, self.rolling_aggs,
            self.group_by_dimension, self.aggs,
        )

    # ------------------------------------------------------------------
    def _execute(self) -> Table:
        t = self.input.execute()
        cap = t.capacity
        nb = self.nbuckets
        alive = jnp.arange(cap) < t.nrows

        dim = self.dimension.evaluate(t)
        dimd = dim.data.astype(jnp.int64)
        bucket = (dimd - self.from_v) // self.every_v
        in_grid = alive & dim.valid & (bucket >= 0) & (bucket < nb)

        # partition ids (sorted grouping over partition keys)
        pcols = [e.evaluate(t) for e, _ in self.partition_by]
        if pcols:
            perm, pid, nparts_dev, sorted_keys = _group_rows(pcols, np.int64(t.nrows))
            nparts = int(nparts_dev)
        else:
            perm = jnp.arange(cap)
            pid = jnp.where(alive, 0, cap - 1)
            nparts = 1
            sorted_keys = []
        bucket_s = bucket[perm]
        in_grid_s = in_grid[perm]
        nseg = nparts * nb
        cgid = jnp.where(
            in_grid_s & (pid < nparts), pid * nb + bucket_s, nseg
        ).astype(jnp.int32)

        def bucketize(vals, kind="sum"):  # [cap] -> [nparts, nb]
            segf = {
                "sum": jax.ops.segment_sum,
                "min": jax.ops.segment_min,
                "max": jax.ops.segment_max,
            }[kind]
            m = segf(vals, cgid, num_segments=nseg + 1)[:nseg]
            return m.reshape(nparts, nb)

        names: list[str] = [n for _, n in self.partition_by]
        out_cols: list[Column] = []

        # partition key values: first row of each pid, tiled over buckets
        fi = _segment_first_index(pid, cap, jnp.arange(cap) < t.nrows)
        out_rows = nparts * nb
        out_cap = round_capacity(max(out_rows, 1))
        for (e, n), (skd, skv) in zip(self.partition_by, sorted_keys):
            kv = skd[fi][:nparts] if nparts <= cap else skd[fi]
            kvv = skv[fi][:nparts]
            tiled = jnp.repeat(kv[:nparts], nb)[:out_rows]
            tiledv = jnp.repeat(kvv[:nparts], nb)[:out_rows]
            out_cols.append(
                Column(
                    e.dtype,
                    _pad(tiled, out_cap),
                    _pad(tiledv, out_cap, bool),
                    e.evaluate(t).dictionary,
                )
            )

        # dimension grid
        grid = self.from_v + jnp.arange(nb, dtype=jnp.int64) * self.every_v
        grid_flat = jnp.tile(grid, nparts)[:out_rows]
        names.append(self.dim_field.name)
        out_cols.append(
            Column(
                self.dim_field.dtype,
                _pad(grid_flat.astype(self.dim_field.dtype.storage_np_dtype()), out_cap),
                _pad(jnp.ones(out_rows, bool), out_cap, bool),
            )
        )

        # rolling aggregates
        for r in self.rolling_aggs:
            names.append(r.agg.name)
            out_cols.append(
                self._rolling_column(r, t, perm, bucketize, nparts, nb, out_rows, out_cap)
            )

        # plain aggregates (GROUP BY DIMENSION): per-bucket, unwindowed
        for a in self.aggs:
            names.append(a.name)
            out_cols.append(
                self._bucket_column(a, t, perm, bucketize, nparts, nb, out_rows, out_cap)
            )

        return Table(names, out_cols, out_rows)

    # ------------------------------------------------------------------
    def _sums_counts(self, a: PhysAggExpr, t, perm, bucketize, as_float):
        v = a.expr.evaluate(t) if a.expr is not None else None
        if v is None:
            ones = jnp.ones(t.capacity, jnp.int64)[perm]
            return bucketize(ones), bucketize(ones)
        data = v.data[perm]
        valid = v.valid[perm]
        if as_float:
            x = jnp.where(valid, _to_float(data, v.dtype), 0.0)
        else:
            sdt = a.return_type().storage_np_dtype()
            x = jnp.where(valid, data.astype(sdt), sdt.type(0))
        return bucketize(x), bucketize(valid.astype(jnp.int64))

    def _window_reduce(self, M, pre, post, combine, is_sum):
        """Reduce [nparts, nb] along buckets over window [i-pre, i+post]."""
        nb = M.shape[1]
        if is_sum:
            c = jnp.cumsum(M, axis=1)
            hi = jnp.clip(jnp.arange(nb) + post, 0, nb - 1)
            upper = c[:, hi]
            if pre is None:
                return upper
            lo = jnp.arange(nb) - pre
            lo_c = jnp.clip(lo - 1, 0, nb - 1)
            lower = jnp.where(lo - 1 >= 0, c[:, lo_c], 0)
            return upper - lower
        # min/max: cumulative only (pre=None, post=0)
        if pre is not None or post != 0:
            raise PlanError(
                "ROLLING min/max supports only the cumulative window"
            )
        return jax.lax.associative_scan(combine, M, axis=1)

    def _rolling_column(self, r, t, perm, bucketize, nparts, nb, out_rows, out_cap):
        a = r.agg
        f = a.fun
        if f in ("sum", "count", "avg"):
            as_float = f == "avg"
            S, C = self._sums_counts(a, t, perm, bucketize, as_float)
            Sw = self._window_reduce(S, r.preceding, r.following, None, True)
            Cw = self._window_reduce(C, r.preceding, r.following, None, True)
            if f == "count":
                out = Cw.astype(jnp.int64)
                valid = jnp.ones(out.shape, bool)
            elif f == "sum":
                out = Sw
                valid = Cw > 0
            else:
                out = Sw / jnp.maximum(Cw, 1)
                valid = Cw > 0
        elif f in ("min", "max"):
            v = a.expr.evaluate(t)
            data = v.data[perm]
            valid_in = v.valid[perm]
            sdt = v.dtype.storage_np_dtype()
            ordk = K.orderable_key(data, v.dtype)
            if v.dtype.is_float:
                neutral = jnp.inf if f == "min" else -jnp.inf
            else:
                neutral = jnp.asarray(
                    jnp.iinfo(ordk.dtype).max if f == "min" else jnp.iinfo(ordk.dtype).min,
                    ordk.dtype,
                )
            x = jnp.where(valid_in, ordk, neutral)
            combine = jnp.minimum if f == "min" else jnp.maximum
            M = bucketize(x, kind=f)
            # empty buckets come out as segment identity; neutralize them
            _, C = self._sums_counts(
                PhysAggExpr("count", a.expr, a.name), t, perm, bucketize, False
            )
            M = jnp.where(C > 0, M, neutral)
            Mw = self._window_reduce(M, r.preceding, r.following, combine, False)
            Cw = self._window_reduce(C, r.preceding, r.following, None, True)
            out = Mw.astype(sdt)
            valid = Cw > 0
        else:
            raise PlanError(f"ROLLING({f}) not supported")
        rt = a.return_type()
        flat = out.reshape(-1)[:out_rows].astype(rt.storage_np_dtype())
        vflat = valid.reshape(-1)[:out_rows]
        dic = None
        if f in ("min", "max") and a.expr is not None:
            dic = a.expr.evaluate(t).dictionary
        return Column(rt, _pad(flat, out_cap), _pad(vflat, out_cap, bool), dic)

    def _bucket_column(self, a, t, perm, bucketize, nparts, nb, out_rows, out_cap):
        f = a.fun
        if f in ("sum", "count", "avg"):
            S, C = self._sums_counts(a, t, perm, bucketize, f == "avg")
            if f == "count":
                out = C.astype(jnp.int64)
                valid = jnp.ones(out.shape, bool)
            elif f == "sum":
                out, valid = S, C > 0
            else:
                out, valid = S / jnp.maximum(C, 1), C > 0
        else:
            raise PlanError(
                f"GROUP BY DIMENSION aggregate '{f}' not supported (sum/count/avg)"
            )
        rt = a.return_type()
        flat = out.reshape(-1)[:out_rows].astype(rt.storage_np_dtype())
        vflat = valid.reshape(-1)[:out_rows]
        return Column(rt, _pad(flat, out_cap), _pad(vflat, out_cap, bool))

    def _display_line(self):
        return (
            f"RollingWindowAggExec: dim={self.dim_field.name} "
            f"[{self.from_v}..{self.to_v}] every {self.every_v} x{self.nbuckets}"
        )


def _pad(x, cap, dtype=None):
    dtype = dtype or x.dtype
    n = x.shape[0]
    if n >= cap:
        return x[:cap].astype(dtype)
    return jnp.concatenate([x.astype(dtype), jnp.zeros(cap - n, dtype)])
