"""Exchange operators for staged distributed execution.

Equivalents of Ballista's execution_plans
(/root/reference/ballista/rust/core/src/execution_plans/):
  ShuffleWriterExec    shuffle_writer.rs:63   run a stage for one input
                       partition; hash-partition the output into n spill
                       files (or one file when coalescing)
  ShuffleReaderExec    shuffle_reader.rs:46   fetch + concat assigned files
  UnresolvedShuffleExec unresolved_shuffle.rs:39  placeholder swapped for a
                       reader once stage locations are known
  DistScanExec         (scan leaf)            one partition slice of a
                       registered table — Ballista's file-split scan
                       partition, by named-table reference so task plans
                       stay compact on the wire

On a TPU pod slice these operators move HOST-level data between stages
(DCN / shared filesystem); intra-slice exchange is the all_to_all collective
path in datafusion_tpu.parallel. The single-device engine executes each
stage's operator subtree on the local chip.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table, round_capacity
from ..errors import InternalError
from ..ops import kernels as K
from ..ops.base import ExecutionPlan
from ..types import Schema
from . import shuffle_io

# ---------------------------------------------------------------------------


def _fnv1a64(s: str) -> int:
    """Deterministic cross-process string hash (FNV-1a, 64-bit)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - 0x10000000000000000 if h >= 0x8000000000000000 else h


def _string_value_hashes(dic) -> np.ndarray:
    """int64 value-hash LUT over a StringDict's codes (cached per dict)."""
    cached = getattr(dic, "_value_hash_lut", None)
    if cached is None:
        cached = np.array([_fnv1a64(str(v)) for v in dic.values], dtype=np.int64)
        try:
            dic._value_hash_lut = cached
        except AttributeError:
            pass  # __slots__ without the attribute: recompute per call
    return cached


def slice_table(t: Table, lo: int, hi: int) -> Table:
    """Row-range view [lo, hi) as a compacted Table."""
    n = max(hi - lo, 0)
    cap = round_capacity(n)
    cols = []
    for c in t.columns:
        d = np.zeros(cap, dtype=np.asarray(c.data[:1]).dtype)
        v = np.zeros(cap, dtype=bool)
        if n:
            d[:n] = np.asarray(c.data[lo:hi])
            v[:n] = np.asarray(c.valid[lo:hi])
        cols.append(Column(c.dtype, jnp.asarray(d), jnp.asarray(v), c.dictionary))
    return Table(list(t.names), cols, n)


class TableStore:
    """Named-table registry shared by scheduler and executors.

    Standalone mode: one in-proc object (the reference's standalone sled +
    in-proc executor, client/src/context.rs:83-115).  Multi-process mode:
    `spill_dir` backs every table as a .dfs file that executors load lazily.
    """

    def __init__(self, spill_dir: str | None = None):
        self._tables: dict[str, Table] = {}
        self.spill_dir = spill_dir

    def put(self, name: str, t: Table):
        self._tables[name] = t
        if self.spill_dir is not None:
            shuffle_io.write_table(os.path.join(self.spill_dir, f"{name}.dfs"), t)

    def get(self, name: str) -> Table:
        t = self._tables.get(name)
        if t is None and self.spill_dir is not None:
            path = os.path.join(self.spill_dir, f"{name}.dfs")
            if os.path.exists(path):
                t = shuffle_io.read_table(path)
                self._tables[name] = t
        if t is None:
            raise InternalError(f"table '{name}' not in executor table store")
        return t

    def names(self) -> list[str]:
        return sorted(self._tables)


# ---------------------------------------------------------------------------


class DistScanExec(ExecutionPlan):
    """Partition `partition`/`num_partitions` of a registered table."""

    def __init__(
        self,
        table_name: str,
        schema: Schema,
        projection: list[int] | None,
        num_partitions: int,
        partition: int | None = None,
        store: TableStore | None = None,
    ):
        super().__init__()
        self.table_name = table_name
        self._schema = schema
        self.projection = projection
        self.num_partitions = num_partitions
        self.partition = partition
        self.store = store

    def schema(self) -> Schema:
        if self.projection is None:
            return self._schema
        return Schema([self._schema.fields[i] for i in self.projection])

    def with_new_children(self, c):
        return self

    def output_partition_count(self) -> int:
        return self.num_partitions

    def _execute(self) -> Table:
        if self.store is None or self.partition is None:
            raise InternalError("DistScanExec not bound to a store/partition")
        t = self.store.get(self.table_name)
        if self.projection is not None:
            t = t.select([t.names[i] for i in self.projection])
        per = -(-max(t.nrows, 1) // self.num_partitions)
        lo = min(self.partition * per, t.nrows)
        hi = min(lo + per, t.nrows)
        out = slice_table(t, lo, hi)
        # physical column names must match the planned (qualified) names
        return Table(self.schema().names(), out.columns, out.nrows)

    def _display_line(self):
        p = "*" if self.partition is None else self.partition
        return f"DistScanExec: {self.table_name}[{p}/{self.num_partitions}]"


class ShuffleWriterExec(ExecutionPlan):
    """Execute the inner plan for one input partition and write its output
    into `num_output_partitions` spill files (hash of `partition_exprs`),
    or a single file when `partition_exprs` is None (coalesce)."""

    def __init__(
        self,
        job_id: str,
        stage_id: int,
        plan: ExecutionPlan,
        partition_exprs: list | None,  # list[PhysicalExpr] or None
        num_output_partitions: int,
        work_dir: str = "",
        input_partition: int = 0,
    ):
        super().__init__()
        self.job_id = job_id
        self.stage_id = stage_id
        self.plan = plan
        self.partition_exprs = partition_exprs
        self.num_output_partitions = num_output_partitions
        self.work_dir = work_dir
        self.input_partition = input_partition

    def schema(self) -> Schema:
        return self.plan.schema()

    def children(self):
        return [self.plan]

    def with_new_children(self, c):
        return ShuffleWriterExec(
            self.job_id,
            self.stage_id,
            c[0],
            self.partition_exprs,
            self.num_output_partitions,
            self.work_dir,
            self.input_partition,
        )

    # -- file layout -------------------------------------------------------
    @staticmethod
    def file_path(work_dir: str, job_id: str, stage_id: int, in_part: int, out_part: int) -> str:
        return os.path.join(
            work_dir, job_id, f"stage{stage_id}", f"in{in_part}_out{out_part}.dfs"
        )

    def _execute(self) -> Table:
        raise InternalError("ShuffleWriterExec runs via execute_shuffle_write()")

    def execute_shuffle_write(self, mesh=None) -> list[dict]:
        """Run the stage; returns per-output-partition stats + locations
        (execute_shuffle_write, shuffle_writer.rs:130).

        With ``mesh``, the stage subtree executes SPMD over the executor's
        local device slice (SpmdExecutor) instead of single-device — the
        ICI-inside-a-slice / spill-files-across-slices hybrid of SURVEY
        §2.8 (each Ballista executor runs its plan on its own resources;
        here the resource is a whole mesh slice)."""
        if mesh is not None:
            from ..parallel.executor import SpmdExecutor

            t = SpmdExecutor(mesh).execute_plan(self.plan)
        else:
            t = self.plan.execute()
        m = self.num_output_partitions
        stats = []
        if self.partition_exprs is None:
            if m != 1:
                raise InternalError("coalesce shuffle must have 1 output partition")
            path = self.file_path(
                self.work_dir, self.job_id, self.stage_id, self.input_partition, 0
            )
            s = shuffle_io.write_table(path, t)
            s["output_partition"] = 0
            stats.append(s)
            return stats

        # hash-partition rows by key exprs (create_hashes % n -> take,
        # shuffle_writer.rs:184-260); same hash as the device shuffle path.
        # String keys hash by VALUE (FNV-1a over the dictionary, then a code
        # LUT) — each partition has its own dictionary, so hashing the codes
        # would break co-partitioning across writers.
        keys = [e.evaluate(t) for e in self.partition_exprs]
        if t.nrows == 0:
            buckets = np.zeros(0, dtype=np.int64)
        else:
            kdatas = []
            for c in keys:
                if c.dtype.is_string and c.dictionary is not None:
                    lut = _string_value_hashes(c.dictionary)
                    codes = np.asarray(c.data[: t.nrows])
                    if len(lut):
                        kdatas.append(jnp.asarray(lut[np.clip(codes, 0, len(lut) - 1)]))
                    else:
                        kdatas.append(jnp.zeros(t.nrows, jnp.int64))
                else:
                    kdatas.append(K.hashable_key(c.data[: t.nrows], c.dtype))
            kvalids = [c.valid[: t.nrows] for c in keys]
            h = K.hash_columns(kdatas, kvalids)
            buckets = np.asarray(h % jnp.uint64(m)).astype(np.int64)

        host_cols = [
            (np.asarray(c.data[: t.nrows]), np.asarray(c.valid[: t.nrows]), c.dtype, c.dictionary)
            for c in t.columns
        ]
        # bucket permutation: native counting sort when built, else argsort
        from .. import native_lib

        native = native_lib.partition_order(buckets.astype(np.uint64), m)
        if native is not None:
            order, starts_n = native
            starts, ends = starts_n[:m], starts_n[1:]
        else:
            order = np.argsort(buckets, kind="stable")
            sorted_buckets = buckets[order]
            starts = np.searchsorted(sorted_buckets, np.arange(m))
            ends = np.searchsorted(sorted_buckets, np.arange(m), side="right")
        for p in range(m):
            idx = order[starts[p] : ends[p]]
            n = len(idx)
            cap = round_capacity(n)
            cols = [
                Column.from_numpy(dt, d[idx], v[idx], dic, capacity=cap)
                for d, v, dt, dic in host_cols
            ]
            part = Table(list(t.names), cols, n)
            path = self.file_path(
                self.work_dir, self.job_id, self.stage_id, self.input_partition, p
            )
            s = shuffle_io.write_table(path, part)
            s["output_partition"] = p
            stats.append(s)
        self.metrics.counter("write_rows").add(int(t.nrows))
        return stats

    def _display_line(self):
        how = (
            f"hash({len(self.partition_exprs)} keys)x{self.num_output_partitions}"
            if self.partition_exprs is not None
            else "coalesce"
        )
        return f"ShuffleWriterExec[stage {self.stage_id}]: {how}"


class UnresolvedShuffleExec(ExecutionPlan):
    """Placeholder for a not-yet-located upstream stage output
    (unresolved_shuffle.rs:39)."""

    def __init__(self, stage_id: int, schema: Schema, num_partitions: int):
        super().__init__()
        self.stage_id = stage_id
        self._schema = schema
        self.num_partitions = num_partitions

    def schema(self):
        return self._schema

    def with_new_children(self, c):
        return self

    def output_partition_count(self) -> int:
        return self.num_partitions

    def _execute(self):
        raise InternalError(
            f"UnresolvedShuffleExec(stage {self.stage_id}) must be resolved "
            "to a ShuffleReaderExec before execution"
        )

    def _display_line(self):
        return f"UnresolvedShuffleExec: stage {self.stage_id} x{self.num_partitions}"


class ShuffleReaderExec(ExecutionPlan):
    """Read one output partition of a completed upstream stage: concat the
    files written by every input partition (shuffle_reader.rs:97-157)."""

    def __init__(self, paths: list[str], schema: Schema):
        super().__init__()
        self.paths = paths
        self._schema = schema

    def schema(self):
        return self._schema

    def with_new_children(self, c):
        return self

    def _execute(self) -> Table:
        t = shuffle_io.concat_read(self.paths, self._schema)
        # align column names with the planned schema (qualified names)
        self.metrics.counter("fetch_rows").add(t.nrows)
        return Table(self._schema.names(), t.columns, t.nrows)

    def _display_line(self):
        return f"ShuffleReaderExec: {len(self.paths)} files"
