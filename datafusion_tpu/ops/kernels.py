"""Core jitted columnar primitives.

These are the TPU-native replacements for the reference's per-row hot loops
(SURVEY.md §7 design translations):

- reference `arrow::compute::filter` per batch
  (/root/reference/datafusion/src/physical_plan/filter.rs)     -> `filter_compact`
  (cumsum-scatter compaction: O(n), no data-dependent shapes)
- reference `lexsort_to_indices` + `take`
  (/root/reference/datafusion/src/physical_plan/sort.rs:201)   -> `lexsort_perm` + `take`
  (iterated stable XLA sorts over order-isomorphic int64 keys)
- reference hashbrown group map row loop
  (/root/reference/datafusion/src/physical_plan/hash_aggregate.rs:409)
                                                               -> sort + `group_ids_sorted`
  + `segment_*` reductions (vectorized, deterministic order)
- reference `JoinHashMap` build/probe
  (/root/reference/datafusion/src/physical_plan/hash_join.rs:649)
                                                               -> `hash_columns` + sorted-hash
  binary search (`searchsorted`) + vectorized candidate expansion
  with exact key verification (mirrors `equal_rows`, hash_join.rs:813)

Everything operates on padded 1-D buffers of static capacity with a traced
live-row count, so varying data sizes reuse compiled programs.

All functions take/return plain jnp arrays (tuples thereof) — the operator
layer (ops/*.py) wraps them with Table/Column bookkeeping.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..types.dtypes import DataType

# ---------------------------------------------------------------------------
# key encoding
# ---------------------------------------------------------------------------


def orderable_key(data: jnp.ndarray, dtype: DataType) -> jnp.ndarray:
    """Map a column's storage buffer to keys whose ascending order equals the
    column's SQL ordering: int64 for integral/dictionary types (strings are
    order-isomorphic codes since dictionaries are sorted), the raw float64
    values for floats (XLA's sort handles float total order directly; the
    int64 bitcast total-order transform is NOT lowerable on TPU under x64
    emulation)."""
    if dtype.is_float:
        return data.astype(jnp.float64)
    return data.astype(jnp.int64)


def hashable_key(data: jnp.ndarray, dtype: DataType) -> jnp.ndarray:
    """int64 key for hashing: floats go through a float32 bitcast (32-bit
    bitcasts lower fine on TPU); equal float64s map to equal int64s, which is
    all hashing needs — exactness comes from post-probe verification."""
    if dtype.is_float:
        bits32 = jax.lax.bitcast_convert_type(
            data.astype(jnp.float32), jnp.int32
        )
        return bits32.astype(jnp.int64)
    if dtype.is_bool:
        return data.astype(jnp.int64)
    return data.astype(jnp.int64)


# ---------------------------------------------------------------------------
# hashing (splitmix64-style avalanche, vectorized)
# ---------------------------------------------------------------------------


def _mix64(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint64)
    x = (x ^ (x >> 30)) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> 27)) * jnp.uint64(0x94D049BB133111EB)
    return x ^ (x >> 31)


@jax.jit
def _hash_init(shape_like: jnp.ndarray) -> jnp.ndarray:
    return jnp.full(shape_like.shape, 0x9E3779B97F4A7C15, dtype=jnp.uint64)


@jax.jit
def _hash_accum(h: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    kk = jnp.where(v, k, jnp.int64(-0x61C8864680B583EB)).astype(jnp.uint64)
    return _mix64(h ^ (kk + jnp.uint64(0x9E3779B97F4A7C15) + (h << 6) + (h >> 2)))


def hash_columns(keys: list[jnp.ndarray], valids: list[jnp.ndarray]) -> jnp.ndarray:
    """Combine N int64 key columns into one uint64 hash per row.

    Replaces the reference's vectorized `create_hashes`
    (/root/reference/datafusion/src/physical_plan/hash_join.rs:983).
    Null keys hash as a distinct constant; exactness is guaranteed by key
    verification after probe, not by the hash."""
    h = _hash_init(keys[0])
    for k, v in zip(keys, valids):
        h = _hash_accum(h, k, v)
    return h


# ---------------------------------------------------------------------------
# compaction (filter)
# ---------------------------------------------------------------------------


@jax.jit
def _compact_order(keep: jnp.ndarray, nrows: jnp.ndarray):
    """Gather permutation putting kept rows first (stable)."""
    cap = keep.shape[0]
    alive = jnp.arange(cap) < nrows
    keep = keep & alive
    order = jnp.argsort(~keep, stable=True)
    cnt = jnp.sum(keep)
    return order, jnp.arange(cap) < cnt, cnt


@jax.jit
def _gather_compact(data: jnp.ndarray, order: jnp.ndarray):
    return data[order]


@jax.jit
def _gather_compact_valid(valid: jnp.ndarray, order: jnp.ndarray, live: jnp.ndarray):
    return valid[order] & live


def filter_compact(datas: tuple, valids: tuple, keep: jnp.ndarray, nrows: jnp.ndarray):
    """Move rows where ``keep`` holds to the front of fresh buffers.

    Returns (datas, valids, count).  Dead rows (index >= nrows) never kept.
    Stable argsort(~keep) + per-column gather — a cap-sized scatter is ~5x
    slower than this on TPU.  Compiled per (dtype, capacity): one shared
    order computation plus a per-column gather, so adding columns never
    triggers new compiles."""
    order, live, cnt = _compact_order(keep, nrows)
    out_d = tuple(_gather_compact(d, order) for d in datas)
    out_v = tuple(_gather_compact_valid(v, order, live) for v in valids)
    return out_d, out_v, cnt


# ---------------------------------------------------------------------------
# sorting
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("desc", "nulls_first"))
def _refine_by_key(
    idx: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    desc: bool,
    nulls_first: bool,
) -> jnp.ndarray:
    """One stable refinement of permutation `idx` by a more-significant key."""
    kk = k[idx]
    if desc:
        if jnp.issubdtype(kk.dtype, jnp.floating):
            kk = -kk
        else:
            kk = jnp.bitwise_not(kk)  # strictly order-reversing, no overflow
    order = jnp.argsort(kk, stable=True)
    idx = idx[order]
    vv = v[idx]
    nullrank = jnp.where(vv, 1, 0 if nulls_first else 2)
    order = jnp.argsort(nullrank, stable=True)
    return idx[order]


@jax.jit
def _alive_first(idx: jnp.ndarray, nrows: jnp.ndarray) -> jnp.ndarray:
    alive = idx < nrows
    order = jnp.argsort(~alive, stable=True)
    return idx[order]


def lexsort_perm(
    ordkeys: tuple,
    key_valids: tuple,
    nrows: jnp.ndarray,
    descs: tuple,
    nulls_firsts: tuple,
) -> jnp.ndarray:
    """Permutation sorting rows by (k1, k2, ...) with per-key direction and
    null placement; dead rows go last; stable.

    Iterated stable sorts from least- to most-significant key — each
    refinement preserves the previous order within equal keys (classic LSD),
    entirely via XLA's stable sort: no scalar loops, and compiles key on
    (dtype, capacity, desc, nulls_first) per refinement step rather than on
    whole key-tuple signatures."""
    cap = ordkeys[0].shape[0]
    idx = jnp.arange(cap)
    for k, v, desc, nf in reversed(
        list(zip(ordkeys, key_valids, descs, nulls_firsts))
    ):
        idx = _refine_by_key(idx, k, v, desc, nf)
    return _alive_first(idx, nrows)


@jax.jit
def _gather(data: jnp.ndarray, idx: jnp.ndarray):
    return data[idx]


def take(datas: tuple, valids: tuple, idx: jnp.ndarray):
    """Gather rows by index (the reference's arrow `take` kernel);
    per-column jit so compiles key on (dtype, capacity) only."""
    return tuple(_gather(d, idx) for d in datas), tuple(
        _gather(v, idx) for v in valids
    )


# ---------------------------------------------------------------------------
# grouping
# ---------------------------------------------------------------------------


@jax.jit
def _boundary_accum(boundary: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    return boundary | (k != jnp.roll(k, 1)) | (v != jnp.roll(v, 1))


@jax.jit
def _gid_from_boundary(boundary: jnp.ndarray, nrows: jnp.ndarray):
    cap = boundary.shape[0]
    alive = jnp.arange(cap) < nrows
    boundary = boundary.at[0].set(True) & alive
    gid = jnp.cumsum(boundary) - 1
    ngroups = jnp.where(nrows > 0, gid[jnp.maximum(nrows - 1, 0)] + 1, 0)
    gid = jnp.where(alive, gid, cap - 1)
    return gid, ngroups


def group_ids_sorted(
    sorted_keys: tuple, sorted_valids: tuple, nrows: jnp.ndarray
):
    """Given key columns already sorted by `lexsort_perm`, return
    (gid per row, ngroups).  A group boundary is any change in (key, valid)
    on any key column.  Dead rows get gid == cap-1 and are excluded by
    callers via ngroups."""
    cap = sorted_keys[0].shape[0]
    boundary = jnp.zeros(cap, dtype=bool)
    for k, v in zip(sorted_keys, sorted_valids):
        boundary = _boundary_accum(boundary, k, v)
    return _gid_from_boundary(boundary, nrows)


# Segment reductions assume SORTED dense gid (0..ngroups-1 for live rows,
# cap-1 for trailing dead rows) — the invariant every grouping path in this
# engine produces.  On TPU a cap-sized scatter (which jax.ops.segment_sum
# lowers to) costs 0.5-0.8 s at 8M rows, while a segmented scan-with-reset
# plus two small gathers costs ~10 ms, so these lower to scans instead.
# Scanning (not cumsum-and-subtract) also avoids float cancellation: each
# segment accumulates only its own values.


def _segment_positions(gid):
    """(first_pos, last_pos) per dense segment id, segment-ordered.

    Only entries [0, #segments) are meaningful; callers mask by ngroups."""
    cap = gid.shape[0]
    boundary = (gid != jnp.roll(gid, 1)).at[0].set(True)
    first_pos = jnp.argsort(~boundary, stable=True)
    last_pos = jnp.concatenate(
        [first_pos[1:] - 1, jnp.array([cap - 1], first_pos.dtype)]
    )
    # segments beyond the boundary count have first > last; clamp so the
    # gathered garbage stays in range (masked by callers)
    last_pos = jnp.maximum(last_pos, first_pos)
    return first_pos, last_pos


def _segment_scan(values, gid, combine):
    """Running within-segment reduction (resets at boundaries)."""

    def comb(a, b):
        ag, av = a
        bg, bv = b
        return bg, jnp.where(ag == bg, combine(av, bv), bv)

    _, run = jax.lax.associative_scan(comb, (gid, values))
    return run


def segment_sum(values, gid, num_segments):
    run = _segment_scan(values, gid, lambda a, b: a + b)
    _, last_pos = _segment_positions(gid)
    out = run[last_pos]
    if num_segments != values.shape[0]:  # pragma: no cover - pad/trim
        out = out[:num_segments]
    return out


def segment_min(values, gid, num_segments):
    run = _segment_scan(values, gid, jnp.minimum)
    _, last_pos = _segment_positions(gid)
    out = run[last_pos]
    if num_segments != values.shape[0]:  # pragma: no cover
        out = out[:num_segments]
    return out


def segment_max(values, gid, num_segments):
    run = _segment_scan(values, gid, jnp.maximum)
    _, last_pos = _segment_positions(gid)
    out = run[last_pos]
    if num_segments != values.shape[0]:  # pragma: no cover
        out = out[:num_segments]
    return out


# ---------------------------------------------------------------------------
# join candidate generation (sorted-hash probe)
# ---------------------------------------------------------------------------


@jax.jit
def join_build_sort(build_hash: jnp.ndarray, nrows_build: jnp.ndarray):
    """Sort build side by hash; dead rows pinned to +inf so they sit at the
    end of the sorted array.  Returns (sorted_hash, order)."""
    cap = build_hash.shape[0]
    alive = jnp.arange(cap) < nrows_build
    h = jnp.where(alive, build_hash, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    order = jnp.argsort(h, stable=True)
    return h[order], order


@jax.jit
def join_probe_counts(
    sorted_hash: jnp.ndarray,
    probe_hash: jnp.ndarray,
    probe_alive_valid: jnp.ndarray,
    nrows_build: jnp.ndarray,
):
    """Per-probe candidate ranges [lo, hi) in the sorted build hashes.

    Probe rows that are dead or have null keys get empty ranges."""
    lo = jnp.searchsorted(sorted_hash, probe_hash, side="left")
    hi = jnp.searchsorted(sorted_hash, probe_hash, side="right")
    hi = jnp.minimum(hi, nrows_build)
    lo = jnp.minimum(lo, hi)
    counts = jnp.where(probe_alive_valid, hi - lo, 0)
    lo = jnp.where(probe_alive_valid, lo, 0)
    return lo, counts


@partial(jax.jit, static_argnames=("out_cap",))
def join_expand(
    lo: jnp.ndarray,
    counts: jnp.ndarray,
    build_order: jnp.ndarray,
    out_cap: int,
):
    """Materialize candidate pairs: output slot r -> (probe_idx, build_idx).

    Vectorized run expansion via cumsum + searchsorted (no loops):
      starts = exclusive cumsum(counts);  probe(r) = # starts <= r  - 1.
    Slots >= total are dead (alive=False)."""
    cum = jnp.cumsum(counts)
    total = cum[-1]
    starts = cum - counts
    r = jnp.arange(out_cap)
    probe_idx = jnp.searchsorted(cum, r, side="right")
    probe_idx = jnp.minimum(probe_idx, lo.shape[0] - 1)
    offset_in_run = r - starts[probe_idx]
    build_pos = lo[probe_idx] + offset_in_run
    build_pos = jnp.clip(build_pos, 0, build_order.shape[0] - 1)
    build_idx = build_order[build_pos]
    alive = r < total
    return probe_idx, build_idx, alive, total


@jax.jit
def _verify_accum(ok, pk, pv, bk, bv, probe_idx, build_idx):
    return ok & pv[probe_idx] & bv[build_idx] & (pk[probe_idx] == bk[build_idx])


def verify_equal(
    probe_keys: tuple,
    probe_valids: tuple,
    build_keys: tuple,
    build_valids: tuple,
    probe_idx: jnp.ndarray,
    build_idx: jnp.ndarray,
    alive: jnp.ndarray,
):
    """Exact key-equality check on candidate pairs (mirrors `equal_rows`,
    hash_join.rs:813): both sides non-null and equal on every key column."""
    ok = alive
    for pk, pv, bk, bv in zip(probe_keys, probe_valids, build_keys, build_valids):
        ok = _verify_accum(ok, pk, pv, bk, bv, probe_idx, build_idx)
    return ok
