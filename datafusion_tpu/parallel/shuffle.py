"""Distributed radix shuffle: hash-partition rows across mesh shards with
`lax.all_to_all` over ICI.

Replaces the reference's two exchange mechanisms (SURVEY.md §2.8 mapping):
- RepartitionExec::Hash intra-process channels
  (/root/reference/datafusion/src/physical_plan/repartition.rs:285-330)
- Ballista ShuffleWriterExec/ShuffleReaderExec IPC-file shuffle
  (core/src/execution_plans/shuffle_writer.rs:130-260, shuffle_reader.rs:97)

Each shard buckets its live rows by destination (hash % ndev) into a
[ndev, B] send buffer via sort + scatter, exchanges buckets with one
all_to_all, and compacts received rows to the front.  B is a static bucket
capacity; the safe default B = shard_cap can never overflow (a shard holds
at most shard_cap rows total).  Callers wanting tighter memory pass smaller
B and check the returned overflow count (capacity-estimation + retry,
SURVEY.md §7 hard part (b)).

All functions here run INSIDE shard_map (per-shard views, collectives by
axis name).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import kernels as K
from .mesh import AXIS


def local_alive(cap: int, nrows_local: jnp.ndarray) -> jnp.ndarray:
    return jnp.arange(cap) < nrows_local[0]


def shuffle_by_hash(
    datas: list[jnp.ndarray],
    valids: list[jnp.ndarray],
    nrows_local: jnp.ndarray,
    key_hash: jnp.ndarray,
    ndev: int,
    bucket_cap: int,
):
    """Per-shard body: route row i to shard (key_hash[i] % ndev).

    Returns (datas', valids', nrows_local', overflow) where the outputs have
    local capacity ndev * bucket_cap.
    """
    cap = key_hash.shape[0]
    alive = local_alive(cap, nrows_local)
    dest = (key_hash % jnp.uint64(ndev)).astype(jnp.int32)
    return shuffle_by_dest(datas, valids, alive, dest, ndev, bucket_cap)


def shuffle_by_dest(
    datas: list[jnp.ndarray],
    valids: list[jnp.ndarray],
    alive: jnp.ndarray,
    dest: jnp.ndarray,
    ndev: int,
    bucket_cap: int,
):
    """Per-shard body: route row i to shard dest[i] (int32 in [0, ndev));
    dead rows (alive False) are dropped.  Same return contract as
    shuffle_by_hash."""
    cap = dest.shape[0]
    dest = jnp.where(alive, dest, ndev)  # dead rows -> overflow bucket

    # per-dest counts and starts
    onehot = jax.nn.one_hot(dest, ndev + 1, dtype=jnp.int32)
    counts = jnp.sum(onehot, axis=0)[:ndev]
    starts = jnp.cumsum(counts) - counts

    # stable co-sort by dest carrying every column: rows for shard s then
    # occupy the contiguous range [starts[s], starts[s]+counts[s]), so the
    # [ndev, B] send layout is a pure GATHER from sorted order — no
    # scatter anywhere (TPU scatters cost ~10x a payload-carrying sort;
    # see ops/kernels.py co-sorting note)
    _, moved = K.cosort((dest,), tuple(datas) + tuple(valids))
    sorted_d = moved[: len(datas)]
    sorted_v = moved[len(datas):]

    overflow = jnp.maximum(jnp.max(counts) - bucket_cap, 0)

    p = jnp.arange(ndev * bucket_cap)
    s = (p // bucket_cap).astype(jnp.int32)
    k = (p % bucket_cap).astype(jnp.int32)
    src_idx = jnp.clip(starts[s] + k, 0, cap - 1).astype(jnp.int32)
    slot_live = k < jnp.minimum(counts[s], bucket_cap)

    # counts exchange: row r of send_counts goes to shard r
    recv_counts = jax.lax.all_to_all(
        jnp.minimum(counts, bucket_cap).reshape(ndev, 1), AXIS, split_axis=0, concat_axis=0
    ).reshape(ndev)

    out_datas, out_valids = [], []
    for d, v in zip(sorted_d, sorted_v):
        send = K.gather64(d, src_idx)
        sendv = v[src_idx] & slot_live
        recv = jax.lax.all_to_all(
            send.reshape(ndev, bucket_cap), AXIS, split_axis=0, concat_axis=0
        ).reshape(-1)
        recvv = jax.lax.all_to_all(
            sendv.reshape(ndev, bucket_cap), AXIS, split_axis=0, concat_axis=0
        ).reshape(-1)
        out_datas.append(recv)
        out_valids.append(recvv)

    # compact received rows (rows [s*B, s*B + recv_counts[s]) are live):
    # one co-sort keyed on ~keep carrying all received columns
    rowpos = jnp.arange(ndev * bucket_cap)
    src = rowpos // bucket_cap
    within = rowpos % bucket_cap
    keep = within < recv_counts[src]
    new_n = jnp.sum(recv_counts)
    live = rowpos < new_n
    _, moved = K.cosort((~keep,), tuple(out_datas) + tuple(out_valids))
    out_datas = list(moved[: len(out_datas)])
    out_valids = [v & live for v in moved[len(out_datas):]]
    return out_datas, out_valids, new_n.reshape(1).astype(jnp.int64), overflow


def shuffle_split(
    key_datas: list[jnp.ndarray],
    key_valids: list[jnp.ndarray],
    pay_datas: list[jnp.ndarray],
    pay_valids: list[jnp.ndarray],
    nrows_local: jnp.ndarray,
    key_hash: jnp.ndarray,
    ndev: int,
    bucket_cap: int,
):
    """Late-materialization split shuffle: key columns ride the two co-sorts
    (dest layout + receive compaction) exactly as in shuffle_by_dest, while
    PAYLOAD columns take a pure gather -> all_to_all path and arrive
    UNCOMPACTED.  A receive-slot index column rides the key compaction, so
    callers materialize payload rows later with one gather per column
    (``pay_recv_d[k][pos2[i]]``).

    This is the double-buffered exchange of SURVEY §2.8's pipeline mapping:
    the payload all_to_alls have no data dependency on anything the caller
    computes from the keys, so XLA's latency-hiding scheduler (async
    collectives on real ICI) overlaps the payload transfer with the probe/
    build compute that consumes only keys.  It is also strictly less work —
    payloads no longer ride two variadic sorts per shuffle (bench/micro.py
    ``exchange_overlap`` measures the overlap itself).

    Returns (key_datas', key_valids', pos2, new_n, overflow,
    pay_recv_d, pay_recv_v):

    - key outputs compacted to the front, capacity ndev * bucket_cap
    - pos2: int32 [ndev*bucket_cap]; compacted row i's payload lives at
      receive slot pos2[i] (garbage for i >= new_n)
    - pay_recv_d / pay_recv_v: uncompacted receive buffers; valids are
      dead-slot-masked, so a gather through pos2 of a live compacted row is
      always safe.
    """
    cap = key_hash.shape[0]
    alive = local_alive(cap, nrows_local)
    dest = (key_hash % jnp.uint64(ndev)).astype(jnp.int32)
    return shuffle_split_dest(
        key_datas, key_valids, pay_datas, pay_valids, alive, dest, ndev,
        bucket_cap,
    )


def shuffle_split_dest(
    key_datas: list[jnp.ndarray],
    key_valids: list[jnp.ndarray],
    pay_datas: list[jnp.ndarray],
    pay_valids: list[jnp.ndarray],
    alive: jnp.ndarray,
    dest: jnp.ndarray,
    ndev: int,
    bucket_cap: int,
):
    """shuffle_split with an arbitrary destination map (0..ndev-1 for live
    rows) — used by range-partitioned dist_sort as well as hash routing."""
    cap = dest.shape[0]
    dest = jnp.where(alive, dest, ndev)

    onehot = jax.nn.one_hot(dest, ndev + 1, dtype=jnp.int32)
    counts = jnp.sum(onehot, axis=0)[:ndev]
    starts = jnp.cumsum(counts) - counts

    # dest-sort carrying key columns + the original row position
    pos0 = jnp.arange(cap, dtype=jnp.int32)
    _, moved = K.cosort(
        (dest,), tuple(key_datas) + tuple(key_valids) + (pos0,)
    )
    nk = len(key_datas)
    sorted_kd = moved[:nk]
    sorted_kv = moved[nk : 2 * nk]
    sorted_pos = moved[2 * nk]

    overflow = jnp.maximum(jnp.max(counts) - bucket_cap, 0)

    p = jnp.arange(ndev * bucket_cap)
    s = (p // bucket_cap).astype(jnp.int32)
    k = (p % bucket_cap).astype(jnp.int32)
    src_idx = jnp.clip(starts[s] + k, 0, cap - 1).astype(jnp.int32)
    slot_live = k < jnp.minimum(counts[s], bucket_cap)

    recv_counts = jax.lax.all_to_all(
        jnp.minimum(counts, bucket_cap).reshape(ndev, 1), AXIS, split_axis=0, concat_axis=0
    ).reshape(ndev)

    def exchange(send):
        return jax.lax.all_to_all(
            send.reshape(ndev, bucket_cap), AXIS, split_axis=0, concat_axis=0
        ).reshape(-1)

    key_recv_d = [exchange(K.gather64(d, src_idx)) for d in sorted_kd]
    key_recv_v = [exchange(v[src_idx] & slot_live) for v in sorted_kv]

    # payload path: composite send gather (original row -> send slot), one
    # all_to_all, NO compaction — pos2 below translates compacted key rows
    # to receive slots
    pay_send_idx = sorted_pos[src_idx]
    pay_recv_d = [exchange(K.gather64(d, pay_send_idx)) for d in pay_datas]
    pay_recv_v = [exchange(v[pay_send_idx] & slot_live) for v in pay_valids]

    # receive compaction of keys, carrying the receive-slot index
    rowpos = jnp.arange(ndev * bucket_cap)
    src = rowpos // bucket_cap
    within = rowpos % bucket_cap
    keep = within < recv_counts[src]
    new_n = jnp.sum(recv_counts)
    live = rowpos < new_n
    _, moved2 = K.cosort(
        (~keep,), tuple(key_recv_d) + tuple(key_recv_v) + (rowpos.astype(jnp.int32),)
    )
    out_kd = list(moved2[:nk])
    out_kv = [v & live for v in moved2[nk : 2 * nk]]
    pos2 = moved2[2 * nk]
    return (
        out_kd,
        out_kv,
        pos2,
        new_n.reshape(1).astype(jnp.int64),
        overflow,
        pay_recv_d,
        pay_recv_v,
    )


def shuffle_exchange_dest(
    key_datas: list[jnp.ndarray],
    key_valids: list[jnp.ndarray],
    pay_datas: list[jnp.ndarray],
    pay_valids: list[jnp.ndarray],
    alive: jnp.ndarray,
    dest: jnp.ndarray,
    ndev: int,
    bucket_cap: int,
):
    """Exchange WITHOUT receive compaction: keys ride the dest co-sort,
    payloads take the near-sequential send gather, and both arrive slot-
    structured (shard s's rows in slots [s*bucket_cap, s*bucket_cap+n_s)).
    The caller folds compaction into its OWN next payload-carrying sort via
    the returned ``keep`` mask (dead_mask=~keep) — on TPU a payload column
    riding one extra sort is ~7x cheaper than one random gather
    (bench/MICRO.md), so fusing compaction into the consumer's sort beats
    both a separate compaction co-sort and gather-based late
    materialization.

    Returns (key_recv_d, key_recv_v, pay_recv_d, pay_recv_v, keep, new_n,
    overflow)."""
    cap = dest.shape[0]
    dest = jnp.where(alive, dest, ndev)

    onehot = jax.nn.one_hot(dest, ndev + 1, dtype=jnp.int32)
    counts = jnp.sum(onehot, axis=0)[:ndev]
    starts = jnp.cumsum(counts) - counts

    pos0 = jnp.arange(cap, dtype=jnp.int32)
    nk = len(key_datas)
    _, moved = K.cosort(
        (dest,), tuple(key_datas) + tuple(key_valids) + (pos0,)
    )
    sorted_kd = moved[:nk]
    sorted_kv = moved[nk : 2 * nk]
    sorted_pos = moved[2 * nk]

    overflow = jnp.maximum(jnp.max(counts) - bucket_cap, 0)

    p = jnp.arange(ndev * bucket_cap)
    s = (p // bucket_cap).astype(jnp.int32)
    k = (p % bucket_cap).astype(jnp.int32)
    src_idx = jnp.clip(starts[s] + k, 0, cap - 1).astype(jnp.int32)
    slot_live = k < jnp.minimum(counts[s], bucket_cap)

    recv_counts = jax.lax.all_to_all(
        jnp.minimum(counts, bucket_cap).reshape(ndev, 1), AXIS,
        split_axis=0, concat_axis=0,
    ).reshape(ndev)

    def exchange(send):
        return jax.lax.all_to_all(
            send.reshape(ndev, bucket_cap), AXIS, split_axis=0, concat_axis=0
        ).reshape(-1)

    key_recv_d = [exchange(K.gather64(d, src_idx)) for d in sorted_kd]
    key_recv_v = [exchange(v[src_idx] & slot_live) for v in sorted_kv]
    pay_send_idx = sorted_pos[src_idx]
    pay_recv_d = [exchange(K.gather64(d, pay_send_idx)) for d in pay_datas]
    pay_recv_v = [exchange(v[pay_send_idx] & slot_live) for v in pay_valids]

    rowpos = jnp.arange(ndev * bucket_cap)
    keep = (rowpos % bucket_cap) < recv_counts[rowpos // bucket_cap]
    new_n = jnp.sum(recv_counts)
    return (
        key_recv_d,
        key_recv_v,
        pay_recv_d,
        pay_recv_v,
        keep,
        new_n.reshape(1).astype(jnp.int64),
        overflow,
    )
