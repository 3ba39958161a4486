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
    dest = jnp.where(alive, dest, ndev)  # dead rows -> overflow bucket

    # per-dest counts and starts
    onehot = jax.nn.one_hot(dest, ndev + 1, dtype=jnp.int32)
    counts = jnp.sum(onehot, axis=0)[:ndev]
    starts = jnp.cumsum(counts) - counts

    # stable sort by dest; slot within destination bucket
    order = jnp.argsort(dest, stable=True)
    ds = dest[order]
    r = jnp.arange(cap)
    slot = r - jnp.concatenate([starts, jnp.zeros(1, starts.dtype)])[
        jnp.clip(ds, 0, ndev)
    ]
    sendable = ds < ndev
    overflow = jnp.maximum(jnp.max(counts) - bucket_cap, 0)
    target = jnp.where(
        sendable & (slot < bucket_cap), ds * bucket_cap + slot, ndev * bucket_cap
    )

    # counts exchange: row r of send_counts goes to shard r
    recv_counts = jax.lax.all_to_all(
        jnp.minimum(counts, bucket_cap).reshape(ndev, 1), AXIS, split_axis=0, concat_axis=0
    ).reshape(ndev)

    out_datas, out_valids = [], []
    for d, v in zip(datas, valids):
        send = (
            jnp.zeros(ndev * bucket_cap, d.dtype)
            .at[target]
            .set(d[order], mode="drop")
        )
        sendv = (
            jnp.zeros(ndev * bucket_cap, bool)
            .at[target]
            .set(v[order] & sendable, mode="drop")
        )
        recv = jax.lax.all_to_all(
            send.reshape(ndev, bucket_cap), AXIS, split_axis=0, concat_axis=0
        ).reshape(-1)
        recvv = jax.lax.all_to_all(
            sendv.reshape(ndev, bucket_cap), AXIS, split_axis=0, concat_axis=0
        ).reshape(-1)
        out_datas.append(recv)
        out_valids.append(recvv)

    # compact received rows (rows [s*B, s*B + recv_counts[s]) are live)
    rowpos = jnp.arange(ndev * bucket_cap)
    src = rowpos // bucket_cap
    within = rowpos % bucket_cap
    keep = within < recv_counts[src]
    new_n = jnp.sum(recv_counts)
    pos = jnp.cumsum(keep) - 1
    tgt = jnp.where(keep, pos, ndev * bucket_cap)
    out_datas = [
        jnp.zeros_like(d).at[tgt].set(d, mode="drop") for d in out_datas
    ]
    out_valids = [
        jnp.zeros_like(v).at[tgt].set(v & keep, mode="drop") for v in out_valids
    ]
    return out_datas, out_valids, new_n.reshape(1).astype(jnp.int64), overflow
