"""Device mesh + sharded tables: the engine's partition model.

Replaces the reference's partition-per-Tokio-task model and Ballista's
executor fleet (SURVEY.md §2.8): a partition = one mesh shard of every
column buffer; exchange = XLA collectives over ICI instead of
RepartitionExec channels / Arrow Flight shuffle files.

One mesh axis ("dp") shards the row axis.  A ShardedTable holds
row-sharded global arrays plus a per-shard live-row count; live rows sit at
the FRONT of each shard (same compaction invariant as single-device Tables).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..columnar.column import Column
from ..columnar.table import Table, round_capacity
from ..errors import InternalError

AXIS = "dp"


def host_read(x) -> np.ndarray:
    """np.asarray for a possibly multi-controller global array.

    Under jax.distributed (parallel/multihost.py) a mesh spans every
    host's devices and shard data is NOT process-local; fetching it
    requires an all-gather through the runtime.  Single-process arrays
    take the direct path."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


@dataclass
class ShardedTable:
    """Row-sharded table: data/valid arrays have global shape
    (ndev * shard_cap,) sharded on AXIS; nrows has shape (ndev,) (one count
    per shard, sharded so each device owns its own count)."""

    names: list[str]
    dtypes: list
    dicts: list
    datas: list[jnp.ndarray]
    valids: list[jnp.ndarray]
    nrows: jnp.ndarray  # (ndev,) int64
    mesh: Mesh
    shard_cap: int

    @property
    def ndev(self) -> int:
        return self.mesh.devices.size

    def total_rows(self) -> int:
        return int(jnp.sum(self.nrows))

    # ---- host <-> device ------------------------------------------------
    @staticmethod
    def from_table(t: Table, mesh: Mesh) -> "ShardedTable":
        """Round-robin-block scatter a host/single-device Table onto the mesh
        (the reference's RepartitionExec::RoundRobinBatch equivalent)."""
        ndev = mesh.devices.size
        per = -(-max(t.nrows, 1) // ndev)  # ceil
        shard_cap = round_capacity(per)
        counts = np.minimum(
            np.maximum(t.nrows - per * np.arange(ndev), 0), per
        ).astype(np.int64)
        datas, valids = [], []
        sharding = NamedSharding(mesh, P(AXIS))
        for c in t.columns:
            host_d = np.asarray(c.data[: t.nrows])
            host_v = np.asarray(c.valid[: t.nrows])
            buf = np.zeros((ndev, shard_cap), dtype=host_d.dtype)
            vbuf = np.zeros((ndev, shard_cap), dtype=bool)
            for d in range(ndev):
                lo = d * per
                n = counts[d]
                buf[d, :n] = host_d[lo : lo + n]
                vbuf[d, :n] = host_v[lo : lo + n]
            datas.append(jax.device_put(buf.reshape(-1), sharding))
            valids.append(jax.device_put(vbuf.reshape(-1), sharding))
        nrows = jax.device_put(counts, sharding)
        return ShardedTable(
            list(t.names),
            [c.dtype for c in t.columns],
            [c.dictionary for c in t.columns],
            datas,
            valids,
            nrows,
            mesh,
            shard_cap,
        )

    @staticmethod
    def from_host(host, mesh: Mesh) -> "ShardedTable":
        """Shard a HOST-resident table (datasource/host.py HostTable)
        straight onto the mesh: each device receives only its own N/ndev
        row slice, and the full table never materializes on any single
        device — out-of-HBM scans compose with the mesh (the reference
        streams scans under any plan, parquet.rs:596-636; here the whole
        mesh is the streaming target and per-chip residency is the
        shard, not the table)."""
        ndev = mesh.devices.size
        n = host.nrows
        per = -(-max(n, 1) // ndev)  # ceil
        shard_cap = round_capacity(per)
        counts = np.minimum(
            np.maximum(n - per * np.arange(ndev), 0), per
        ).astype(np.int64)
        sharding = NamedSharding(mesh, P(AXIS))
        datas, valids = [], []
        for d, v in zip(host.datas, host.valids):
            buf = np.zeros((ndev, shard_cap), dtype=d.dtype)
            vbuf = np.zeros((ndev, shard_cap), dtype=bool)
            for i in range(ndev):
                lo = i * per
                k = counts[i]
                buf[i, :k] = d[lo : lo + k]
                vbuf[i, :k] = v[lo : lo + k]
            # device_put with a row sharding ships each device ONLY its
            # (shard_cap,) slice; the (ndev, shard_cap) staging buffer
            # lives in host RAM like the HostTable itself
            datas.append(jax.device_put(buf.reshape(-1), sharding))
            valids.append(jax.device_put(vbuf.reshape(-1), sharding))
        nrows = jax.device_put(counts, sharding)
        return ShardedTable(
            list(host.names),
            list(host.dtypes),
            list(host.dicts),
            datas,
            valids,
            nrows,
            mesh,
            shard_cap,
        )

    def shrink(self, margin: int = 0) -> "ShardedTable":
        """Right-size shard capacity to the actual live-row maximum.

        Distributed operators size outputs statically (join pair_cap =
        fanout * probe cap, shuffle recv = ndev * bucket); without
        shrinking, capacities COMPOUND across a plan (each join inflates
        ~fanout*ndev x) and later operators compute over padding.  One tiny
        D2H sync reads the per-shard counts; one jitted per-shard slice
        repacks.  Live rows are already front-compacted per shard, so the
        slice is the whole operation."""
        counts = host_read(self.nrows)  # one host sync
        need = int(counts.max()) + margin if counts.size else 1
        newcap = round_capacity(max(need, 1))
        if newcap >= self.shard_cap:
            return self
        from jax.sharding import PartitionSpec as P

        def body(*arrays):
            return tuple(a[:newcap] for a in arrays)

        n = len(self.datas)
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=tuple(P(AXIS) for _ in range(2 * n)),
                out_specs=tuple(P(AXIS) for _ in range(2 * n)),
            )
        )
        out = fn(*self.datas, *self.valids)
        st2 = ShardedTable(
            list(self.names),
            list(self.dtypes),
            list(self.dicts),
            list(out[:n]),
            list(out[n:]),
            self.nrows,
            self.mesh,
            newcap,
        )
        # carry operator exchange statistics (mesh EXPLAIN ANALYZE)
        if hasattr(self, "exchange_info"):
            st2.exchange_info = self.exchange_info
        return st2

    def shard_tables(self) -> list[Table]:
        """One single-device Table per shard (collect_partitioned contract:
        dataframe.rs returns per-partition batches)."""
        ndev = self.ndev
        counts = host_read(self.nrows)
        out = []
        for i in range(ndev):
            n = int(counts[i])
            cap = round_capacity(max(n, 1))
            cols = []
            for dt, dic, d, v in zip(
                self.dtypes, self.dicts, self.datas, self.valids
            ):
                hd = host_read(d).reshape(ndev, self.shard_cap)[i]
                hv = host_read(v).reshape(ndev, self.shard_cap)[i]
                buf = np.zeros(cap, dtype=hd.dtype)
                vbuf = np.zeros(cap, dtype=bool)
                buf[:n] = hd[:n]
                vbuf[:n] = hv[:n]
                cols.append(Column(dt, jnp.asarray(buf), jnp.asarray(vbuf), dic))
            out.append(Table(list(self.names), cols, n))
        return out

    def to_table(self) -> Table:
        """Gather all shards into one compacted single-device Table."""
        ndev = self.ndev
        counts = host_read(self.nrows)
        total = int(counts.sum())
        cap = round_capacity(total)
        cols = []
        for dt, dic, d, v in zip(self.dtypes, self.dicts, self.datas, self.valids):
            hd = host_read(d).reshape(ndev, self.shard_cap)
            hv = host_read(v).reshape(ndev, self.shard_cap)
            buf = np.zeros(cap, dtype=hd.dtype)
            vbuf = np.zeros(cap, dtype=bool)
            at = 0
            for i in range(ndev):
                n = int(counts[i])
                buf[at : at + n] = hd[i, :n]
                vbuf[at : at + n] = hv[i, :n]
                at += n
            cols.append(Column(dt, jnp.asarray(buf), jnp.asarray(vbuf), dic))
        return Table(self.names, cols, total)
