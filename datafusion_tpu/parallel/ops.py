"""Distributed (SPMD) operator implementations.

Each distributed operator is ONE jitted shard_map program over the mesh —
the TPU-native replacement for Ballista's stage execution (SURVEY.md §7):

  dist_filter / dist_project     local per-shard (reference: partition-local
                                 FilterExec/ProjectionExec)
  dist_aggregate                 partial local agg -> all_to_all re-key by
                                 group hash -> final local agg (reference:
                                 Partial/FinalPartitioned HashAggregate +
                                 hash RepartitionExec, planner.rs:526-601)
  dist_join                      all_to_all both sides by key hash -> local
                                 sorted-hash join (reference: repartitioned
                                 HashJoinExec PartitionMode::Partitioned)
  broadcast_join                 all-gather small build side (reference:
                                 PartitionMode::CollectLeft)

Expression evaluation happens inside shard_map on per-shard Table views;
host-side dictionary work (string LUTs, literal codes) happens once at trace
time and is embedded as replicated constants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..columnar.column import Column
from ..columnar.table import Table, round_capacity
from ..errors import ExecutionError, PlanError
from ..exprs.physical import PhysicalExpr, harmonize_strings
from ..ops import kernels as K
from ..ops.aggregate import PhysAggExpr, _eval_aggregate, _group_rows, _merge_aggregate, _segment_first_index
from .mesh import AXIS, ShardedTable
from .shuffle import (
    local_alive,
    shuffle_by_hash,
    shuffle_exchange_dest,
    shuffle_split,
)


def _attach_info(st: ShardedTable, **info) -> ShardedTable:
    """Record exchange statistics on the operator's output (surfaced by
    mesh EXPLAIN ANALYZE — the analogue of the reference's repartition
    metrics, repartition.rs:58-100 / shuffle_writer.rs:260-300).  All
    values are trace-time static (bucket sizes, receive capacities, byte
    volumes); live row counts are added by the executor, which already
    syncs per-shard counts when right-sizing capacities."""
    st.exchange_info = dict(info)
    return st


def _exchange_bytes(datas, ndev: int, bucket_cap: int) -> int:
    """Upper-bound bytes one shard sends through an all_to_all exchange:
    ndev * bucket_cap slots per column (data + 1-byte valid)."""
    return sum(
        ndev * bucket_cap * (d.dtype.itemsize + 1) for d in datas
    )


def default_bucket(shard_cap: int, ndev: int) -> int:
    """Memory-scalable receive-bucket default (reference repartition.rs:
    285-330 holds only each partition's share, never the full table).

    Under uniform hashing each source shard sends ~shard_cap/ndev rows to
    each destination, so a 2x-margin bucket keeps every receive buffer at
    ndev*B ~= 2*shard_cap ~= 2*N/ndev — per-chip exchange memory and the
    local join/sort/aggregate working set shrink proportionally as chips
    are added, instead of staying at ndev*shard_cap = the full table.
    Skew shows up as shuffle overflow (exact max-deficit counts), which
    the dist_* operators right-size in ONE retry.  Clamped to shard_cap:
    a source shard can never send more than its own row count to one
    destination, so larger buckets are pure padding."""
    return min(
        round_capacity(max(-(-2 * shard_cap // ndev), 1)),
        round_capacity(shard_cap),
    )


def _pay_at(pd, pv, pmap, idx):
    """Materialize payload rows at compacted row indices ``idx`` with ONE
    packed [N, W] row gather (kernels.take_rows — per-column gathers cost
    ~4x more on TPU; this is the same move the local join's output
    materialization made in r4).  pmap=None means payloads are already in
    compacted order (skew path)."""
    m = idx if pmap is None else pmap[idx.astype(jnp.int32)]
    out_d, out_v, _ = K.take_rows(tuple(pd), tuple(pv), m)
    return list(out_d), list(out_v)


def _pay_full(pd, pv, pmap):
    """Payload columns in compacted order over the full capacity."""
    if pmap is None:
        return list(pd), list(pv)
    out_d, out_v, _ = K.take_rows(tuple(pd), tuple(pv), pmap)
    return list(out_d), list(out_v)


def _local_view(st: ShardedTable, datas, valids) -> Table:
    """Per-shard Table view for expression evaluation inside shard_map.
    nrows is not used by expression evaluation (masking is the operator's
    job), so it is set to 0."""
    cols = [
        Column(dt, d, v, dic)
        for dt, dic, d, v in zip(st.dtypes, st.dicts, datas, valids)
    ]
    return Table(list(st.names), cols, 0)


def _shard_map(mesh, fn, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _specs(n):
    return tuple(P(AXIS) for _ in range(n))


# ---------------------------------------------------------------------------
# filter / project
# ---------------------------------------------------------------------------


def dist_filter(st: ShardedTable, pred: PhysicalExpr) -> ShardedTable:
    ncols = len(st.datas)

    def body(nrows, *arrays):
        datas = list(arrays[:ncols])
        valids = list(arrays[ncols:])
        t = _local_view(st, datas, valids)
        p = pred.evaluate(t)
        keep = p.data.astype(bool) & p.valid & local_alive(st.shard_cap, nrows)
        # co-sort compaction instead of a shard-cap-sized scatter
        # (bench/MICRO.md rules 1/7)
        cnt = jnp.sum(keep)
        _, moved = K.cosort((~keep,), tuple(datas) + tuple(valids))
        live = jnp.arange(st.shard_cap) < cnt
        out_d = list(moved[:ncols])
        out_v = [v & live for v in moved[ncols:]]
        return (cnt.reshape(1).astype(jnp.int64), *out_d, *out_v)

    fn = _shard_map(
        st.mesh,
        body,
        in_specs=_specs(1 + 2 * ncols),
        out_specs=_specs(1 + 2 * ncols),
    )
    out = jax.jit(fn)(st.nrows, *st.datas, *st.valids)
    nrows, rest = out[0], out[1:]
    return ShardedTable(
        st.names,
        st.dtypes,
        st.dicts,
        list(rest[:ncols]),
        list(rest[ncols:]),
        nrows,
        st.mesh,
        st.shard_cap,
    )


def dist_project(
    st: ShardedTable, exprs: list[tuple[PhysicalExpr, str]]
) -> ShardedTable:
    ncols = len(st.datas)

    def body(nrows, *arrays):
        datas = list(arrays[:ncols])
        valids = list(arrays[ncols:])
        t = _local_view(st, datas, valids)
        outs = [e.evaluate(t) for e, _ in exprs]
        return tuple(c.data for c in outs) + tuple(c.valid for c in outs)

    fn = _shard_map(
        st.mesh,
        body,
        in_specs=_specs(1 + 2 * ncols),
        out_specs=_specs(2 * len(exprs)),
    )
    out = jax.jit(fn)(st.nrows, *st.datas, *st.valids)
    k = len(exprs)
    # output dtypes/dicts come from a host-side trace-free evaluation plan:
    # evaluate on an empty local view to learn dtype/dictionary
    meta = [e.dtype for e, _ in exprs]
    sample = _local_view(
        st,
        [jnp.zeros(1, d.dtype) for d in st.datas],
        [jnp.zeros(1, bool) for _ in st.valids],
    )
    dicts = []
    for e, _ in exprs:
        c = e.evaluate(sample)
        dicts.append(c.dictionary)
    return ShardedTable(
        [n for _, n in exprs],
        meta,
        dicts,
        list(out[:k]),
        list(out[k:]),
        st.nrows,
        st.mesh,
        st.shard_cap,
    )


# ---------------------------------------------------------------------------
# aggregate
# ---------------------------------------------------------------------------


def dist_aggregate(
    st: ShardedTable,
    group_expr: list[tuple[PhysicalExpr, str]],
    aggr_expr: list[PhysAggExpr],
    bucket_cap: int | None = None,
) -> ShardedTable:
    """partial local agg -> all_to_all by group-key hash -> final local agg,
    fused into one jitted SPMD program.

    Global DISTINCT (no group keys): scalar partial states would over-count
    values repeated across shards (the reference keeps the value SET as
    state, distinct_expressions.rs), so rows first all_to_all by the hash
    of the DISTINCT argument — every copy of a value lands on ONE shard,
    the local dedup (_distinct_mask) becomes a global dedup, and the
    partial states merge exactly like non-distinct ones.  Requires all
    DISTINCT aggregates to share one argument expression (the common
    COUNT(DISTINCT x) shape); mixed arguments fall back to a gather.
    Grouped DISTINCT goes through dist_aggregate_exact instead."""
    distinct_aggs = [a for a in aggr_expr if a.distinct]
    pre_expr = None
    if distinct_aggs:
        dargs = {str(a.expr) for a in distinct_aggs}
        if group_expr or len(dargs) != 1 or any(
            a.expr is None for a in distinct_aggs
        ):
            raise ExecutionError(
                "dist_aggregate: DISTINCT requires a single shared argument "
                "and no group keys (grouped DISTINCT uses row placement)"
            )
        pre_expr = distinct_aggs[0].expr
    ndev = st.ndev
    ncols = len(st.datas)
    cap = st.shard_cap
    auto = bucket_cap is None
    B = bucket_cap or default_bucket(cap, ndev)

    # partial state schema
    state_names: list[str] = [n for _, n in group_expr]
    state_dtypes = [e.dtype for e, _ in group_expr]
    for a in aggr_expr:
        for sn, sd in a.state_fields():
            state_names.append(sn)
            state_dtypes.append(sd)
    out_names = [n for _, n in group_expr] + [a.name for a in aggr_expr]
    out_dtypes = [e.dtype for e, _ in group_expr] + [
        a.return_type() for a in aggr_expr
    ]

    def body(nrows, *arrays):
        datas = list(arrays[:ncols])
        valids = list(arrays[ncols:])
        t = _local_view(st, datas, valids)
        nloc = nrows[0]
        pcap = cap
        pre_ovf = jnp.int32(0)

        # ---- phase 0 (global DISTINCT only): place rows by value hash --------
        if pre_expr is not None:
            dv = pre_expr.evaluate(t)
            vhash = K.hash_columns(
                [K.hashable_key(dv.data, dv.dtype)], [dv.valid]
            )
            datas, valids, new_nr, pre_ovf = shuffle_by_hash(
                datas, valids, nrows, vhash, ndev, B
            )
            t = _local_view(st, datas, valids)
            nloc = new_nr[0]
            pcap = ndev * B

        # ---- phase 1: local partial aggregate --------------------------------
        key_cols = [e.evaluate(t) for e, _ in group_expr]
        if key_cols:
            perm, gid, ngroups, sorted_keys = _group_rows(key_cols, nloc)
        else:
            perm = jnp.arange(pcap)
            gid = jnp.where(jnp.arange(pcap) < nloc, 0, pcap - 1)
            ngroups = jnp.where(nloc >= 0, 1, 1)
            sorted_keys = []
        alive_sorted = jnp.arange(pcap) < nloc

        part_d: list[jnp.ndarray] = []
        part_v: list[jnp.ndarray] = []
        for kc, (skd, skv) in zip(key_cols, sorted_keys):
            first_idx = _segment_first_index(gid, cap, alive_sorted)
            part_d.append(skd[first_idx])
            part_v.append(skv[first_idx] & (jnp.arange(cap) < ngroups))

        def _part_loop():
            return [
                _eval_aggregate(
                    a, t, perm, gid, pcap, alive_sorted, ngroups, emit_state=True
                )
                for a in aggr_expr
            ]

        for cols in K.seg_batch(_part_loop):
            for c in cols:
                part_d.append(c.data)
                part_v.append(c.valid)

        # ---- phase 2: shuffle partial states by group-key hash ----------------
        nkeys = len(group_expr)
        if nkeys:
            khash = K.hash_columns(
                [
                    K.hashable_key(part_d[i], state_dtypes[i])
                    for i in range(nkeys)
                ],
                [part_v[i] for i in range(nkeys)],
            )
            sh_d, sh_v, new_n, sh_ovf = shuffle_by_hash(
                part_d, part_v, ngroups.reshape(1), khash, ndev, B
            )
            fcap = ndev * B
        else:
            # global aggregate: reduce states onto every shard via psum-style
            # all_gather of the single state row
            g = [
                jax.lax.all_gather(d[:1], AXIS).reshape(-1) for d in part_d
            ]
            gv = [
                jax.lax.all_gather(v[:1], AXIS).reshape(-1) for v in part_v
            ]
            pad = cap - ndev
            sh_d = [
                jnp.concatenate([x, jnp.zeros(pad, x.dtype)]) for x in g
            ]
            sh_v = [
                jnp.concatenate([x, jnp.zeros(pad, bool)]) for x in gv
            ]
            new_n = jnp.full((1,), ndev, jnp.int64)
            sh_ovf = pre_ovf  # phase-0 value-placement overflow (DISTINCT)
            fcap = cap

        # ---- phase 3: local final aggregate over states ------------------------
        nloc2 = new_n[0]
        skey_cols = [
            Column(state_dtypes[i], sh_d[i], sh_v[i], st_dict)
            for i, st_dict in zip(range(nkeys), _group_dicts(group_expr, st))
        ]
        if skey_cols:
            perm2, gid2, ngroups2, sorted2 = _group_rows(skey_cols, nloc2)
        else:
            perm2 = jnp.arange(fcap)
            gid2 = jnp.where(jnp.arange(fcap) < nloc2, 0, fcap - 1)
            ngroups2 = jnp.int64(1)
            sorted2 = []
        alive2 = jnp.arange(fcap) < nloc2

        fin_d, fin_v = [], []
        for kc, (skd, skv) in zip(skey_cols, sorted2):
            fi = _segment_first_index(gid2, fcap, alive2)
            fin_d.append(skd[fi])
            fin_v.append(skv[fi] & (jnp.arange(fcap) < ngroups2))
        def _fin_loop():
            idx = nkeys
            acc = []
            for a in aggr_expr:
                nstate = len(a.state_fields())
                scols = [
                    Column(state_dtypes[idx + j], sh_d[idx + j], sh_v[idx + j])
                    for j in range(nstate)
                ]
                idx += nstate
                acc.append(
                    _merge_aggregate(a, scols, perm2, gid2, fcap, alive2, ngroups2)
                )
            return acc

        for merged in K.seg_batch(_fin_loop):
            fin_d.append(merged.data)
            fin_v.append(merged.valid)

        if nkeys:
            out_n = ngroups2
        else:
            # global aggregate: result replicated on every shard after the
            # all_gather; only shard 0 claims the row
            me = jax.lax.axis_index(AXIS)
            out_n = jnp.where(me == 0, 1, 0)
        return (
            jnp.asarray(out_n).reshape(1).astype(jnp.int64),
            jnp.asarray(sh_ovf).reshape(1).astype(jnp.int64),
            *fin_d,
            *fin_v,
        )

    k = len(out_names)
    fn = _shard_map(
        st.mesh,
        body,
        in_specs=_specs(1 + 2 * ncols),
        out_specs=_specs(2 + 2 * k),
    )
    out = jax.jit(fn)(st.nrows, *st.datas, *st.valids)
    ovf = int(jnp.max(out[1]))
    if ovf > 0:
        if not auto:
            raise ExecutionError(
                "dist_aggregate: state shuffle overflow at pinned bucket_cap"
            )
        # exact deficit: B + ovf can never overflow again
        return dist_aggregate(
            st, group_expr, aggr_expr, bucket_cap=round_capacity(B + ovf)
        )
    nkeys = len(group_expr)
    out_cap = (ndev * B) if nkeys else cap
    dicts = list(_group_dicts(group_expr, st)) + [
        _agg_dict(a, st) for a in aggr_expr
    ]
    return _attach_info(
        ShardedTable(
            out_names,
            out_dtypes,
            dicts,
            list(out[2 : 2 + k]),
            list(out[2 + k :]),
            out[0],
            st.mesh,
            out_cap,
        ),
        op="dist_aggregate",
        mode=(
            "partial+rekey+final"
            if nkeys
            else (
                "value_place+all_gather_states"
                if pre_expr is not None
                else "all_gather_states"
            )
        ),
        bucket_cap=B,
        recv_cap=out_cap,
        exchange_bytes=_exchange_bytes(out[2 : 2 + k], ndev, B) if nkeys else 0,
    )


def _group_dicts(group_expr, st: ShardedTable):
    sample = _local_view(
        st,
        [jnp.zeros(1, d.dtype) for d in st.datas],
        [jnp.zeros(1, bool) for _ in st.valids],
    )
    return [e.evaluate(sample).dictionary for e, _ in group_expr]


def _agg_dict(a: PhysAggExpr, st: ShardedTable):
    if a.fun in ("min", "max") and a.expr is not None:
        sample = _local_view(
            st,
            [jnp.zeros(1, d.dtype) for d in st.datas],
            [jnp.zeros(1, bool) for _ in st.valids],
        )
        return a.expr.evaluate(sample).dictionary
    return None


# ---------------------------------------------------------------------------
# join
# ---------------------------------------------------------------------------


SKEW_NB = 1024  # hash-histogram buckets for hot-key detection


def dist_join(
    left: ShardedTable,
    right: ShardedTable,
    on: list[tuple[PhysicalExpr, PhysicalExpr]],
    join_type: str = "inner",
    filter: PhysicalExpr | None = None,
    fanout: int = 4,
    bucket_cap: int | None = None,
    out_cap: int | None = None,
    skew: bool = False,
    broadcast: bool = False,
) -> ShardedTable:
    """Partitioned hash join, ALL SIX join types (reference
    hash_join.rs:139-144 PartitionMode::Partitioned over Inner/Left/Right/
    Full/Semi/Anti): all_to_all both sides by key hash, then a local
    six-type sorted-hash join per shard.  Hash partitioning puts every key
    on exactly ONE shard, so per-shard unmatched-row detection (outer
    joins' visited mask) is complete without any cross-shard reduction.

    `filter` is an optional residual predicate over the combined
    left++right schema (same contract as single-device HashJoinExec).

    Pair capacity per shard is fanout * probe_cap (static); on overflow the
    returned per-shard candidate totals right-size ONE retry (no 4x/16x/64x
    recompile escalation).

    ``skew=True`` compiles the SKEW-AWARE variant (SURVEY §7 hard part (f)):
    an in-program psum histogram over SKEW_NB hash buckets marks buckets
    whose global probe count exceeds total/(2*ndev) as HOT; hot probe rows
    STAY LOCAL (perfect balance, zero transfer) while their build rows are
    replicated to every shard via all_gather — the broadcast-skew-join
    hybrid.  Non-hot keys take the normal all_to_all partition.  Everything
    stays inside the one SPMD program: no host syncs, no retries."""
    ndev = left.ndev
    nl, nr = len(left.datas), len(right.datas)
    auto = bucket_cap is None
    Bl = bucket_cap or default_bucket(left.shard_cap, ndev)
    Br = bucket_cap or default_bucket(right.shard_cap, ndev)
    if skew and broadcast:
        raise ExecutionError("dist_join: skew and broadcast are exclusive")
    if skew:
        # [local-hot | nonhot-recv] probe region; [gathered-hot | nonhot-recv] build
        lcap2 = left.shard_cap + ndev * Bl
        rcap2 = ndev * right.shard_cap + ndev * Br
    elif broadcast:
        # CollectLeft mode (hash_join.rs:285): probes stay local, the whole
        # build side replicates to every shard via all_gather — zero probe
        # transfer, right for small build sides (dimension tables)
        lcap2 = left.shard_cap
        rcap2 = ndev * right.shard_cap
    else:
        lcap2 = ndev * Bl
        rcap2 = ndev * Br
    pair_cap = out_cap if out_cap is not None else fanout * max(lcap2, 1)

    def body(lnrows, rnrows, *arrays):
        ld = list(arrays[:nl])
        lv = list(arrays[nl : 2 * nl])
        rd = list(arrays[2 * nl : 2 * nl + nr])
        rv = list(arrays[2 * nl + nr :])
        lt = _local_view(left, ld, lv)
        rt = _local_view(right, rd, rv)

        lkeys = [le.evaluate(lt) for le, _ in on]
        rkeys = [re.evaluate(rt) for _, re in on]
        # dictionary harmonization must be identical on both sides: trace-time
        merged = []
        for (le, re_), lc, rc in zip(on, lkeys, rkeys):
            if lc.dtype.is_string and rc.dtype.is_string:
                lc, rc = harmonize_strings(lc, rc)
            merged.append((lc, rc))
        lkeys = [m[0] for m in merged]
        rkeys = [m[1] for m in merged]

        lhash = K.hash_columns(
            [K.hashable_key(c.data, c.dtype) for c in lkeys],
            [c.valid for c in lkeys],
        )
        rhash = K.hash_columns(
            [K.hashable_key(c.data, c.dtype) for c in rkeys],
            [c.valid for c in rkeys],
        )

        if broadcast:
            # probe side untouched (already front-compacted locally)
            lkd = [c.data for c in lkeys]
            lkv = [c.valid for c in lkeys]
            lmap = None
            lpd, lpv = list(ld), list(lv)
            lnew = lnrows.astype(jnp.int64)
            # build side: all_gather keys AND payloads; keys compact via one
            # co-sort carrying the replicated-slot index (payloads stay
            # uncompacted, late-materialized through rmap like the split
            # shuffle).  The gathered layout is identical on every shard,
            # so the unmatched-build bookkeeping reuses the skew path's
            # replicated-rows machinery (pmax visited, shard-0 emission).
            rcnts = jax.lax.all_gather(rnrows, AXIS).reshape(-1)
            rcap0 = right.shard_cap
            seg = jnp.arange(rcap2) // rcap0
            within = jnp.arange(rcap2) % rcap0
            seg_alive = within < rcnts[seg]
            gkd = [
                jax.lax.all_gather(c.data, AXIS).reshape(-1) for c in rkeys
            ]
            gkv = [
                jax.lax.all_gather(c.valid, AXIS).reshape(-1) & seg_alive
                for c in rkeys
            ]
            pos0 = jnp.arange(rcap2, dtype=jnp.int32)
            _, movedb = K.cosort(
                (~seg_alive,), tuple(gkd) + tuple(gkv) + (pos0,)
            )
            nk = len(rkeys)
            rkd = list(movedb[:nk])
            rkv = list(movedb[nk : 2 * nk])
            rmap = movedb[2 * nk]
            rnew = jnp.sum(rcnts).reshape(1).astype(jnp.int64)
            rpd = [jax.lax.all_gather(d, AXIS).reshape(-1) for d in rd]
            rpv = [
                jax.lax.all_gather(v, AXIS).reshape(-1) & seg_alive
                for v in rv
            ]
            hot_build_n = rnew[0]  # whole build replicated on every shard
            sh_ovf = jnp.int32(0)
        elif not skew:
            # split shuffle: keys ride the co-sorts, payloads take the
            # late-materialized gather -> all_to_all path whose collectives
            # overlap the probe compute below (double-buffered exchange)
            lkd, lkv, lmap, lnew, l_ovf, lpd, lpv = shuffle_split(
                [c.data for c in lkeys], [c.valid for c in lkeys],
                ld, lv, lnrows, lhash, ndev, Bl,
            )
            rkd, rkv, rmap, rnew, r_ovf, rpd, rpv = shuffle_split(
                [c.data for c in rkeys], [c.valid for c in rkeys],
                rd, rv, rnrows, rhash, ndev, Br,
            )
            hot_build_n = None
            sh_ovf = jnp.maximum(l_ovf, r_ovf)
        else:
            # skew path shuffles payloads and keys together (hot-row
            # regions need every column in compacted order up front)
            lpack_d = ld + [c.data for c in lkeys]
            lpack_v = lv + [c.valid for c in lkeys]
            rpack_d = rd + [c.data for c in rkeys]
            rpack_v = rv + [c.valid for c in rkeys]
            from .shuffle import shuffle_by_dest

            lc0, rc0 = left.shard_cap, right.shard_cap
            l_alive0 = jnp.arange(lc0) < lnrows[0]
            r_alive0 = jnp.arange(rc0) < rnrows[0]
            # psum histogram over SKEW_NB hash buckets of the PROBE side
            lb = (lhash % jnp.uint64(SKEW_NB)).astype(jnp.int32)
            rb = (rhash % jnp.uint64(SKEW_NB)).astype(jnp.int32)
            hist = (
                jnp.zeros(SKEW_NB, jnp.int32)
                .at[jnp.where(l_alive0, lb, SKEW_NB)]
                .add(1, mode="drop")
            )
            hist = jax.lax.psum(hist, AXIS)
            total_l = jax.lax.psum(lnrows[0], AXIS)
            thresh = jnp.maximum(total_l // (2 * ndev), 64).astype(jnp.int32)
            hot = hist > thresh  # [SKEW_NB]
            lhot = hot[lb] & l_alive0
            rhot = hot[rb] & r_alive0

            # probe: hot rows stay local; nonhot all_to_all by hash
            ldest = (lhash % jnp.uint64(ndev)).astype(jnp.int32)
            sl0_d, sl0_v, lnew0, l_ovf = shuffle_by_dest(
                lpack_d, lpack_v, l_alive0 & ~lhot, ldest, ndev, Bl
            )
            lh_d, lh_v, nhot_l = K.filter_compact(
                tuple(lpack_d), tuple(lpack_v), lhot, jnp.int64(lc0)
            )
            comb_d = [jnp.concatenate([h, s]) for h, s in zip(lh_d, sl0_d)]
            comb_v = [jnp.concatenate([h, s]) for h, s in zip(lh_v, sl0_v)]
            comb_alive = jnp.concatenate(
                [jnp.arange(lc0) < nhot_l, jnp.arange(ndev * Bl) < lnew0[0]]
            )
            sl_dt, sl_vt, lcnt = K.filter_compact(
                tuple(comb_d), tuple(comb_v), comb_alive, jnp.int64(lcap2)
            )
            sl_d, sl_v = list(sl_dt), list(sl_vt)
            lnew = lcnt.reshape(1).astype(jnp.int64)

            # build: hot rows replicate to every shard (all_gather); nonhot
            # all_to_all.  The gathered-hot region goes FIRST, so the stable
            # compaction lands all hot build rows at [0, H) in IDENTICAL
            # order on every shard — the alignment the outer-join visited
            # reduction below relies on.
            rdest = (rhash % jnp.uint64(ndev)).astype(jnp.int32)
            sr0_d, sr0_v, rnew0, r_ovf = shuffle_by_dest(
                rpack_d, rpack_v, r_alive0 & ~rhot, rdest, ndev, Br
            )
            rh_d, rh_v, nhot_r = K.filter_compact(
                tuple(rpack_d), tuple(rpack_v), rhot, jnp.int64(rc0)
            )
            g_d = [jax.lax.all_gather(x, AXIS).reshape(-1) for x in rh_d]
            g_v = [jax.lax.all_gather(x, AXIS).reshape(-1) for x in rh_v]
            g_counts = jax.lax.all_gather(nhot_r, AXIS).reshape(-1)  # [ndev]
            gpos = jnp.arange(ndev * rc0)
            g_alive = (gpos % rc0) < g_counts[gpos // rc0]
            combr_d = [jnp.concatenate([g, s]) for g, s in zip(g_d, sr0_d)]
            combr_v = [jnp.concatenate([g, s]) for g, s in zip(g_v, sr0_v)]
            combr_alive = jnp.concatenate(
                [g_alive, jnp.arange(ndev * Br) < rnew0[0]]
            )
            sr_dt, sr_vt, rcnt = K.filter_compact(
                tuple(combr_d), tuple(combr_v), combr_alive, jnp.int64(rcap2)
            )
            sr_d, sr_v = list(sr_dt), list(sr_vt)
            rnew = rcnt.reshape(1).astype(jnp.int64)
            hot_build_n = jnp.sum(g_counts)  # H: same value on every shard
            sh_ovf = jnp.maximum(l_ovf, r_ovf)
            lkd, lkv = sl_d[nl:], sl_v[nl:]
            rkd, rkv = sr_d[nr:], sr_v[nr:]
            lpd, lpv, lmap = sl_d[:nl], sl_v[:nl], None
            rpd, rpv, rmap = sr_d[:nr], sr_v[:nr], None
        lord = [
            K.orderable_key(d, c.dtype) for d, c in zip(lkd, lkeys)
        ]
        rord = [
            K.orderable_key(d, c.dtype) for d, c in zip(rkd, rkeys)
        ]
        lh2 = K.hash_columns(
            [K.hashable_key(d, c.dtype) for d, c in zip(lkd, lkeys)], lkv
        )
        rh2 = K.hash_columns(
            [K.hashable_key(d, c.dtype) for d, c in zip(rkd, rkeys)], rkv
        )

        sorted_hash, border = K.join_build_sort(rh2, rnew[0])
        l_alive = jnp.arange(lcap2) < lnew[0]
        probe_ok = l_alive
        for v in lkv:
            probe_ok = probe_ok & v
        lo, counts = K.join_probe_counts(sorted_hash, lh2, probe_ok, rnew[0])
        total = jnp.sum(counts)
        probe_idx, build_idx, pair_alive, _ = K.join_expand(lo, counts, border, pair_cap)
        ok = pair_alive
        for pk, pv, bk, bv in zip(lord, lkv, rord, rkv):
            ok = ok & pv[probe_idx] & bv[build_idx] & (pk[probe_idx] == bk[build_idx])
        if filter is not None:
            pi32 = probe_idx.astype(jnp.int32)
            bi32 = build_idx.astype(jnp.int32)
            fl_d, fl_v = _pay_at(lpd, lpv, lmap, pi32)
            fr_d, fr_v = _pay_at(rpd, rpv, rmap, bi32)
            pair_cols = [
                Column(dt, d, v, dic)
                for dt, dic, d, v in zip(left.dtypes, left.dicts, fl_d, fl_v)
            ] + [
                Column(dt, d, v, dic)
                for dt, dic, d, v in zip(right.dtypes, right.dicts, fr_d, fr_v)
            ]
            pair_t = Table(list(left.names) + list(right.names), pair_cols, 0)
            fres = filter.evaluate(pair_t)
            ok = ok & fres.data.astype(bool) & fres.valid

        overflow = jnp.maximum(total - pair_cap, 0).reshape(1).astype(jnp.int64)
        tot1 = total.reshape(1).astype(jnp.int64)
        shov1 = jnp.asarray(sh_ovf).reshape(1).astype(jnp.int64)

        from ..ops.join import _any_match_per_probe

        if join_type in ("semi", "anti"):
            matched = _any_match_per_probe(counts, ok, pair_cap)
            keep = (matched if join_type == "semi" else ~matched) & l_alive
            # compact ONLY the payload-map column, then late-materialize:
            # the compaction sort carries one int32 instead of nl columns
            mpos = lmap if lmap is not None else jnp.arange(lcap2, dtype=jnp.int32)
            (mpos_c,), _, cnt = K.filter_compact((mpos,), (), keep, lnew[0])
            live = jnp.arange(lcap2) < cnt
            out_d = [K.gather64(d, mpos_c) for d in lpd]
            out_v = [v[mpos_c] & live for v in lpv]
            return (cnt.reshape(1).astype(jnp.int64), overflow, tot1, shov1, *out_d, *out_v)

        # matched pairs, compacted by one co-sort of the index pairs
        cnt = jnp.sum(ok)
        _, (pc, bc) = K.cosort((~ok,), (probe_idx, build_idx))
        pair_live = jnp.arange(pair_cap) < cnt
        pc32 = pc.astype(jnp.int32)
        bc32 = bc.astype(jnp.int32)

        pl_d, pl_v = _pay_at(lpd, lpv, lmap, pc32)
        pr_d, pr_v = _pay_at(rpd, rpv, rmap, bc32)
        if join_type == "inner":
            outs_d = pl_d + pr_d
            outs_v = [v & pair_live for v in pl_v] + [v & pair_live for v in pr_v]
            return (cnt.reshape(1).astype(jnp.int64), overflow, tot1, shov1, *outs_d, *outs_v)

        # left / right / full outer: matched pairs ++ unmatched side rows
        # padded with nulls, squeezed by ONE compaction co-sort — the same
        # derivation as single-device phase_b (ops/join.py), valid per
        # shard because hash partitioning co-locates all matches of a key
        col_d = [[d] for d in pl_d] + [[d] for d in pr_d]
        col_v = [[v & pair_live] for v in pl_v] + [
            [v & pair_live] for v in pr_v
        ]
        alive_segs = [pair_live]
        if join_type in ("left", "full"):
            match_probe = _any_match_per_probe(counts, ok, pair_cap)
            lw = l_alive & ~match_probe
            lf_d, lf_v = _pay_full(lpd, lpv, lmap)
            for i, d in enumerate(lf_d):
                col_d[i].append(d)
                col_v[i].append(lf_v[i] & lw)
            for j, d in enumerate(pr_d):
                col_d[nl + j].append(jnp.zeros(lcap2, d.dtype))
                col_v[nl + j].append(jnp.zeros(lcap2, bool))
            alive_segs.append(lw)
        if join_type in ("right", "full"):
            visited = (
                jnp.zeros(rcap2, bool)
                .at[build_idx.astype(jnp.int32)]
                .max(ok, mode="drop")
            )
            r_alive = jnp.arange(rcap2) < rnew[0]
            if hot_build_n is not None:
                # replicated hot build rows sit at [0, H) in identical order
                # on every shard: a row is visited if ANY shard matched it,
                # and only shard 0 may emit it unmatched (exactly-once)
                in_hot = jnp.arange(rcap2) < hot_build_n
                vis_glob = jax.lax.pmax(visited.astype(jnp.int32), AXIS) > 0
                visited = jnp.where(in_hot, vis_glob, visited)
                me = jax.lax.axis_index(AXIS)
                r_alive = r_alive & (~in_hot | (me == 0))
            rw = r_alive & ~visited
            rf_d, rf_v = _pay_full(rpd, rpv, rmap)
            for i, d in enumerate(pl_d):
                col_d[i].append(jnp.zeros(rcap2, d.dtype))
                col_v[i].append(jnp.zeros(rcap2, bool))
            for j, d in enumerate(rf_d):
                col_d[nl + j].append(d)
                col_v[nl + j].append(rf_v[j] & rw)
            alive_segs.append(rw)
        alive_all = jnp.concatenate(alive_segs)
        datas_all = tuple(jnp.concatenate(s) for s in col_d)
        valids_all = tuple(jnp.concatenate(s) for s in col_v)
        out_d, out_v, cnt2 = K.filter_compact(
            datas_all, valids_all, alive_all, jnp.int64(alive_all.shape[0])
        )
        return (cnt2.reshape(1).astype(jnp.int64), overflow, tot1, shov1, *out_d, *out_v)

    if join_type in ("semi", "anti"):
        ncols_out = nl
        final_cap = lcap2
    elif join_type == "inner":
        ncols_out = nl + nr
        final_cap = pair_cap
    else:
        ncols_out = nl + nr
        final_cap = pair_cap
        if join_type in ("left", "full"):
            final_cap += lcap2
        if join_type in ("right", "full"):
            final_cap += rcap2

    fn = _shard_map(
        left.mesh,
        body,
        in_specs=_specs(2 + 2 * nl + 2 * nr),
        out_specs=_specs(4 + 2 * ncols_out),
    )
    out = jax.jit(fn)(
        left.nrows, right.nrows, *left.datas, *left.valids, *right.datas, *right.valids
    )
    sh_ovf = int(jnp.max(out[3]))
    if sh_ovf > 0:
        if not auto:
            raise ExecutionError(
                "dist_join: exchange bucket overflow at pinned bucket_cap"
            )
        # Exchange bucket overflowed (skew): pick the remedy from the exact
        # deficit.  A destination shard would need ndev*(B+ovf) receive
        # slots; if that exceeds 2x an input shard (a shard pulling >2x its
        # fair share), the key distribution is HOT and the skew-aware
        # hybrid (hot probes stay local, hot build rows replicate) is the
        # right plan — the auto-selection the reference derives from
        # statistics (planner.rs:753-851).  Otherwise one exact-sized
        # bucket retry restores balance.
        maxB = max(Bl, Br)
        need = round_capacity(maxB + sh_ovf)
        hot = ndev * need > 2 * max(left.shard_cap, right.shard_cap)
        if hot and not skew:
            res = dist_join(
                left, right, on, join_type, filter, fanout,
                bucket_cap=None, skew=True,
            )
        else:
            res = dist_join(
                left, right, on, join_type, filter, fanout,
                bucket_cap=need, skew=skew,
            )
        res.exchange_info["retries"] = res.exchange_info.get("retries", 0) + 1
        return res
    overflow = int(jnp.max(out[1]))
    if overflow > 0:
        if out_cap is not None:
            raise ExecutionError("distributed join output overflow after resize")
        # right-size ONE retry from the exact per-shard candidate totals
        need = int(jnp.max(out[2]))

        res = dist_join(
            left, right, on, join_type, filter, fanout, bucket_cap,
            out_cap=round_capacity(max(need, 1)), skew=skew,
        )
        res.exchange_info["retries"] = res.exchange_info.get("retries", 0) + 1
        return res
    if join_type in ("semi", "anti"):
        names = list(left.names)
        dtypes = list(left.dtypes)
        dicts = list(left.dicts)
    else:
        names = list(left.names) + list(right.names)
        dtypes = list(left.dtypes) + list(right.dtypes)
        dicts = list(left.dicts) + list(right.dicts)
    return _attach_info(
        ShardedTable(
            names,
            dtypes,
            dicts,
            list(out[4 : 4 + ncols_out]),
            list(out[4 + ncols_out :]),
            out[0],
            left.mesh,
            final_cap,
        ),
        op="dist_join",
        mode="broadcast" if broadcast else ("skew" if skew else "hash"),
        bucket_cap=(Bl, Br),
        recv_cap=(lcap2, rcap2),
        pair_cap=pair_cap,
        retries=0,
        exchange_bytes=(
            _exchange_bytes(right.datas, 1, ndev * right.shard_cap)
            if broadcast
            else _exchange_bytes(left.datas, ndev, Bl)
            + _exchange_bytes(right.datas, ndev, Br)
        ),
    )


# ---------------------------------------------------------------------------
# distributed ORDER BY: sample -> range partition -> all_to_all -> local sort
# ---------------------------------------------------------------------------

_SORT_SAMPLES = 64  # per shard


def dist_sort(st: ShardedTable, sort_exprs, bucket_cap: int | None = None):
    """Globally sort a sharded table: after this, shard i's rows all order
    before shard i+1's and each shard is locally sorted, so reading shards
    in order yields the total order.

    The reference coalesces to one partition for ORDER BY
    (physical_optimizer/merge_exec.rs); this is the TeraSort-style
    TPU-native improvement: each shard samples its first sort key,
    all-gathered samples define ndev-1 range boundaries, rows route to
    their range's shard with ONE all_to_all, and each shard sorts locally
    by the full key list.  Rows equal to a boundary value all land on the
    same shard (strict comparison), so ties never straddle shards.

    Returns (ShardedTable, overflow) — overflow > 0 means a shard's range
    exceeded bucket_cap (heavy skew); retry with a bigger bucket_cap.
    """
    from ..ops.sort import PhysSortExpr  # noqa: F401  (type reference)
    from .shuffle import shuffle_by_dest

    ndev = st.ndev
    ncols = len(st.datas)
    cap = st.shard_cap
    auto = bucket_cap is None
    B = bucket_cap or default_bucket(cap, ndev)
    s0 = sort_exprs[0]
    S = _SORT_SAMPLES

    def body(nrows, *arrays):
        datas = list(arrays[:ncols])
        valids = list(arrays[ncols:])
        t = _local_view(st, datas, valids)
        nloc = nrows[0]
        alive = local_alive(cap, nrows)

        # first-key total order: (nullrank, transformed key)
        c0 = s0.expr.evaluate(t)
        k0 = K.orderable_key(c0.data, c0.dtype)
        if not s0.ascending:
            if jnp.issubdtype(k0.dtype, jnp.floating):
                k0 = -k0
            else:
                k0 = jnp.bitwise_not(k0)
        nr0 = jnp.where(c0.valid, 1, 0 if s0.nulls_first else 2).astype(jnp.int32)

        # sample S live rows per shard (strided over the live prefix is not
        # assumed — live rows may be anywhere, so sample sorted-by-aliveness
        # positions via a cheap co-sort of (dead, nr0, k0))
        (_, snr, sk), _ = K.cosort((~alive, nr0, k0), ())
        nlive = jnp.sum(alive)
        pos = (jnp.arange(S) * jnp.maximum(nlive, 1)) // S
        pos = jnp.clip(pos, 0, cap - 1).astype(jnp.int32)
        samp_nr = jnp.where(jnp.arange(S) < jnp.minimum(nlive, S), snr[pos], 3)
        samp_k = K.gather64(sk, pos)

        # gather all shards' samples; derive global quantile boundaries
        all_nr = jax.lax.all_gather(samp_nr, AXIS).reshape(-1)
        all_k = jax.lax.all_gather(samp_k, AXIS).reshape(-1)
        (all_nr, all_k), _ = K.cosort((all_nr, all_k), ())
        n_samp = jnp.sum(all_nr < 3)
        bpos = ((jnp.arange(ndev - 1) + 1) * jnp.maximum(n_samp, 1)) // ndev
        bpos = jnp.clip(bpos, 0, ndev * S - 1).astype(jnp.int32)
        b_nr = all_nr[bpos]  # [ndev-1]
        b_k = K.gather64(all_k, bpos)

        # shard = number of boundaries strictly below the row's key
        gt = (nr0[None, :] > b_nr[:, None]) | (
            (nr0[None, :] == b_nr[:, None]) & (k0[None, :] > b_k[:, None])
        )
        dest = jnp.sum(gt, axis=0, dtype=jnp.int32)

        # split exchange + ONE fused compaction/sort: the FULL key list's
        # orderable encodings ride the dest co-sort, payload columns take
        # the near-sequential send gather -> all_to_all (overlapping the
        # key-side work), and the receive side runs a SINGLE variadic
        # lexsort that compacts (dead_mask) and sorts everything at once —
        # payloads move through one send gather + one sort ride instead of
        # three sort rides (bench/MICRO.md: a payload riding a sort costs
        # ~1/7 of a random gather on TPU, so compaction folds into the
        # consumer's sort rather than a gather)
        key_cols = [s.expr.evaluate(t) for s in sort_exprs]
        ordkeys = [K.orderable_key(c.data, c.dtype) for c in key_cols]
        kvalids = [c.valid for c in key_cols]
        kd, kv, pay_d, pay_v, keepr, new_n, overflow = shuffle_exchange_dest(
            ordkeys, kvalids, datas, valids, alive, dest, ndev, B
        )
        fcap = ndev * B
        moved, _ = K.lexsort_apply(
            tuple(kd),
            tuple(kv),
            tuple(pay_d) + tuple(pay_v),
            new_n[0],
            tuple(not s.ascending for s in sort_exprs),
            tuple(s.nulls_first for s in sort_exprs),
            dead_mask=~keepr,
        )
        live = jnp.arange(fcap) < new_n[0]
        sorted_d = list(moved[:ncols])
        sorted_v = [v & live for v in moved[ncols:]]
        return (
            new_n,
            jnp.asarray(overflow).reshape(1).astype(jnp.int64),
            *sorted_d,
            *sorted_v,
        )

    fn = _shard_map(
        st.mesh,
        body,
        in_specs=_specs(1 + 2 * ncols),
        out_specs=_specs(2 + 2 * ncols),
    )
    out = jax.jit(fn)(st.nrows, *st.datas, *st.valids)
    nrows, overflow, rest = out[0], out[1], out[2:]
    ovf = int(jnp.max(overflow))
    if ovf > 0 and auto:
        # sampled range boundaries put more than B rows of one shard into
        # one range (value skew): ONE exact-deficit retry
        st2, r_ovf = dist_sort(
            st, sort_exprs, bucket_cap=round_capacity(B + ovf)
        )
        st2.exchange_info["retries"] = st2.exchange_info.get("retries", 0) + 1
        return st2, r_ovf
    new_cap = ndev * B
    st2 = ShardedTable(
        list(st.names),
        list(st.dtypes),
        list(st.dicts),
        list(rest[:ncols]),
        list(rest[ncols:]),
        nrows,
        st.mesh,
        new_cap,
    )
    _attach_info(
        st2,
        op="dist_sort",
        mode="range",
        bucket_cap=B,
        recv_cap=new_cap,
        retries=0,
        exchange_bytes=_exchange_bytes(st.datas, ndev, B),
    )
    return st2, ovf


# ---------------------------------------------------------------------------
# window functions on the mesh
# ---------------------------------------------------------------------------


def dist_window(st: ShardedTable, window_exprs, bucket_cap: int | None = None):
    """Partitioned window functions over the mesh: all_to_all rows by
    PARTITION BY key hash (whole partitions land on one shard), then the
    single-device traced window body (sort + segment scans, ops/window.py)
    runs per shard inside the same SPMD program.

    The reference evaluates windows per lexicographic partition range on a
    single partition stream (windows/window_agg_exec.rs:42); partition-hash
    placement is the distribution-preserving equivalent.  Windows without
    PARTITION BY need a total order — callers fall back to single device.

    Returns (ShardedTable, overflow): overflow > 0 means a shard's receive
    bucket was too small (hot partition) — retry with a bigger bucket_cap.
    Output rows are in (partition, order) sorted order WITHIN each shard;
    cross-shard row order is hash order, not global sort order.
    """
    from ..ops.window import WindowAggExec

    w0 = window_exprs[0]
    if not w0.partition_by:
        raise ExecutionError(
            "dist_window: window without PARTITION BY requires a total order"
        )
    ndev = st.ndev
    ncols = len(st.datas)
    cap = st.shard_cap
    auto = bucket_cap is None
    B = bucket_cap or default_bucket(cap, ndev)
    fcap = ndev * B
    op = WindowAggExec(list(window_exprs), None)

    def body(nrows, *arrays):
        datas = list(arrays[:ncols])
        valids = list(arrays[ncols:])
        t = _local_view(st, datas, valids)
        pcols = [p.evaluate(t) for p in w0.partition_by]
        phash = K.hash_columns(
            [K.hashable_key(c.data, c.dtype) for c in pcols],
            [c.valid for c in pcols],
        )
        sh_d, sh_v, new_n, ovf = shuffle_by_hash(
            datas, valids, nrows, phash, ndev, B
        )
        cols2 = [
            Column(dt, d, v, dic)
            for dt, dic, d, v in zip(st.dtypes, st.dicts, sh_d, sh_v)
        ]
        t2 = Table(list(st.names), cols2, 0)
        _, out_cols = op._traced_window(t2, new_n[0], fcap)
        return (
            new_n,
            jnp.asarray(ovf).reshape(1).astype(jnp.int64),
            *[c.data for c in out_cols],
            *[c.valid for c in out_cols],
        )

    k = ncols + len(window_exprs)
    fn = _shard_map(
        st.mesh,
        body,
        in_specs=_specs(1 + 2 * ncols),
        out_specs=_specs(2 + 2 * k),
    )
    out = jax.jit(fn)(st.nrows, *st.datas, *st.valids)
    nrows, overflow, rest = out[0], out[1], out[2:]
    ovf = int(jnp.max(overflow))
    if ovf > 0 and auto:
        # hot PARTITION BY key: one exact-deficit retry
        st2, r_ovf = dist_window(
            st, window_exprs, bucket_cap=round_capacity(B + ovf)
        )
        st2.exchange_info["retries"] = st2.exchange_info.get("retries", 0) + 1
        return st2, r_ovf
    out_names = list(st.names) + [w.name for w in window_exprs]
    out_dtypes = list(st.dtypes) + [w.dtype for w in window_exprs]
    out_dicts = list(st.dicts) + [_win_dict(w, st) for w in window_exprs]
    st2 = ShardedTable(
        out_names,
        out_dtypes,
        out_dicts,
        list(rest[:k]),
        list(rest[k:]),
        nrows,
        st.mesh,
        fcap,
    )
    _attach_info(
        st2,
        op="dist_window",
        mode="partition_hash",
        bucket_cap=B,
        recv_cap=fcap,
        retries=0,
        exchange_bytes=_exchange_bytes(st.datas, ndev, B),
    )
    return st2, ovf


_GLOBAL_WIN_AGGS = ("count", "sum", "avg", "mean", "min", "max")
_GLOBAL_WIN_FUNS = (
    "row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
    "ntile", "lag", "lead", "first_value", "last_value", "nth_value",
) + _GLOBAL_WIN_AGGS


# explicit ROWS frames distribute with a static edge halo (the lag/lead
# mechanism generalized): bounded offsets up to this many rows cross shard
# boundaries via one ppermute each way
_DIST_FRAME_HALO = 128


def _frame_deltas(fr):
    """Signed row deltas (start, end) relative to the current row; None
    means unbounded."""

    def delta(b):
        if b.kind == "current":
            return 0
        if b.offset is None:
            return None
        off = int(b.offset)
        return -off if b.kind == "preceding" else off

    return delta(fr.start), delta(fr.end)


def _dist_frame_eligible(w) -> bool:
    """Mesh-native explicit frames: ROWS with bounded offsets <= the halo;
    RANGE frames over ONE numeric ORDER BY key, resolved by bisecting the
    halo-extended key plane with a device-side coverage flag (a value
    window wider than the halo falls back to the gather).  GROUPS offsets
    and suffix frames still fall back (par with the reference, which pins
    ALL windows to one partition, windows/window_agg_exec.rs)."""
    if w.fun not in _GLOBAL_WIN_AGGS:
        # the local engine applies frames only to aggregates; ranking /
        # value functions ignore them — same here
        return True
    fr = w.frame
    if fr.units == "range":
        if len(w.order_by) != 1:
            return False
        dt = w.order_by[0].expr.dtype
        if not (dt.is_integer or dt.is_float or dt.is_decimal
                or dt.kind in ("date32", "timestamp_us")):
            return False
        if fr.end.offset is None and fr.end.kind != "current":
            return False  # UNBOUNDED FOLLOWING end: fall back
        if fr.start.offset is None and fr.start.kind not in ("preceding", "current"):
            return False
        try:
            for b in (fr.start, fr.end):
                if b.offset is not None:
                    _range_value_offset(b.offset, dt)
        except Exception:
            return False  # offset incompatible with the key dtype
        return True
    if fr.units != "rows":
        return False
    a, b = _frame_deltas(fr)
    if b is None or abs(b) > _DIST_FRAME_HALO:
        return False
    if a is None:
        return b >= 0  # running frame [start of table, i+b]
    return abs(a) <= _DIST_FRAME_HALO


def _range_value_offset(x, dtype):
    """A RANGE offset on the SQL value axis, converted to the ORDER BY
    key's storage units (mirrors the local engine's conversion in
    ops/window.py _range_offset_bounds: decimal offsets scale by 10^s,
    integer keys demand integral offsets)."""
    if dtype.is_decimal:
        from fractions import Fraction

        v = Fraction(str(x)) * (10 ** dtype.scale)
        if v.denominator != 1:
            raise PlanError("RANGE offset finer than the ORDER BY decimal scale")
        return int(v)
    if dtype.is_float:
        return float(x)
    fx = float(x)
    if fx != int(fx):
        raise PlanError("RANGE offset must be an integer for integer ORDER BY keys")
    return int(fx)


def global_window_eligible(window_exprs) -> bool:
    """True when a no-PARTITION-BY window node can run mesh-native via
    dist_window_global.  Host-side STRUCTURAL check — the executor gathers
    (the reference's SinglePartition plan) when this is False, and treats
    an ExecutionError from dist_window_global itself as a real failure."""
    from ..exprs.physical import PhysLit

    if any(w.partition_by for w in window_exprs):
        return False
    # every expr's ORDER BY must be a prefix of the longest one (the local
    # engine sorts once by the first expr's keys and evaluates each expr's
    # peers over that order — same contract here, sorting by the longest)
    sigs = [
        tuple(
            (str(s.expr), s.ascending, s.nulls_first) for s in w.order_by
        )
        for w in window_exprs
    ]
    longest = max(sigs, key=len)
    if any(sig != longest[: len(sig)] for sig in sigs):
        return False
    for w, sig in zip(window_exprs, sigs):
        if w.frame is not None and not _dist_frame_eligible(w):
            return False
        if w.fun not in _GLOBAL_WIN_FUNS:
            return False
        if not sig and w.fun not in _GLOBAL_WIN_AGGS:
            return False  # ranking/value functions need a total order
        if w.fun in ("lag", "lead"):
            if len(w.args) > 1 and not isinstance(w.args[1], PhysLit):
                return False  # offset must be static for the edge halo
            if len(w.args) > 1 and not (
                0 <= int(w.args[1].value.value or 0) <= 4096
            ):
                return False
    return True


def _halo_ext(plane, fill, ctx, fill_lo=None):
    """Extended per-shard view of a row-aligned plane: ext[q] = the plane's
    value at GLOBAL row (row_off - H + q), q in [0, fcap + 2H).

    Built from all-gathered [ndev, H] head/tail edge planes, so a frame
    that spans several tiny shards still resolves exactly (the shard of a
    global row within +-H of this shard's range always holds it within H
    of its own edge).  Out-of-table positions read ``fill`` (``fill_lo``
    before row 0 when given — RANGE bisects need distinct sentinels at
    each end to keep the plane monotone)."""
    H = _DIST_FRAME_HALO
    nloc, fcap = ctx["nloc"], ctx["fcap"]
    ndev, row_off = ctx["ndev"], ctx["row_off"]
    ends, offsets, N = ctx["ends"], ctx["offsets"], ctx["N"]
    hidx = jnp.arange(H)
    if fcap < H:  # tiny shards: pad so the [H] edge planes index safely
        plane = jnp.concatenate([plane, jnp.full(H - fcap, fill, plane.dtype)])
    head = jnp.where(hidx < nloc, plane[:H], fill)
    tpos = nloc - H + hidx
    tail = jnp.where(
        tpos >= 0, plane[jnp.clip(tpos, 0, plane.shape[0] - 1).astype(jnp.int32)], fill
    )
    heads_all = jax.lax.all_gather(head, AXIS)  # [ndev, H]
    tails_all = jax.lax.all_gather(tail, AXIS)

    q = jnp.arange(fcap + 2 * H)
    j = row_off - H + q  # global row of ext slot q
    in_table = (j >= 0) & (j < N)
    is_local = (j >= row_off) & (j < row_off + nloc)
    # owning shard: first shard whose end exceeds j
    s = jnp.sum((ends[None, :] <= j[:, None]).astype(jnp.int32), axis=1)
    s = jnp.clip(s, 0, ndev - 1)
    d_head = j - offsets[s]  # position from the owner's start
    use_head = d_head < H
    hv = heads_all[s, jnp.clip(d_head, 0, H - 1).astype(jnp.int32)]
    tv = tails_all[s, jnp.clip(H - (ends[s] - j), 0, H - 1).astype(jnp.int32)]
    remote = jnp.where(use_head, hv, tv)
    local = plane[jnp.clip(j - row_off, 0, fcap - 1).astype(jnp.int32)]
    out = jnp.where(is_local, local, remote)
    out = jnp.where(in_table, out, fill)
    if fill_lo is not None:
        out = jnp.where(j < 0, fill_lo, out)
    return out


def _range_ext_bounds(w, t, ctx):
    """RANGE-with-offset frame bounds in halo-extended coordinates:
    per-row vectorized bisect of the sorted ORDER BY key plane extended
    across shard edges (_halo_ext), exactly the local engine's
    _range_offset_bounds over a distributed plane.

    Returns (lo_idx | None for running frames, hi_idx, overflow) where
    overflow flags any live row whose value window reaches past the halo
    coverage — the caller falls back to the gather in that (rare) case
    instead of producing a silently-truncated frame."""
    H = _DIST_FRAME_HALO
    fcap, nloc, alive = ctx["fcap"], ctx["nloc"], ctx["alive"]
    row_off, N = ctx["row_off"], ctx["N"]
    s = w.order_by[0]
    c = s.expr.evaluate(t)
    key = K.orderable_key(c.data, c.dtype)
    if s.ascending is False:
        key = -key  # frames live on the sort direction's axis
    extcap = fcap + 2 * H
    if jnp.issubdtype(key.dtype, jnp.floating):
        kmax = jnp.asarray(jnp.inf, key.dtype)
        kmin = jnp.asarray(-jnp.inf, key.dtype)
    else:
        kmax = jnp.asarray(jnp.iinfo(key.dtype).max, key.dtype)
        kmin = jnp.asarray(jnp.iinfo(key.dtype).min, key.dtype)
    ext = _halo_ext(key, kmax, ctx, fill_lo=kmin)
    # slots past the guaranteed-coverage limit (H beyond this shard's live
    # end) may read garbage from non-adjacent shards: pin them to +max so
    # the plane stays monotone; the coverage flag below catches windows
    # that actually reach there
    qlim = H + nloc + H
    q = jnp.arange(extcap)
    ext = jnp.where(q < qlim, ext, kmax)

    def bisect(target, right):
        lo = jnp.zeros(fcap, jnp.int32)
        hi = jnp.full(fcap, extcap, jnp.int32)
        for _ in range(int(np.ceil(np.log2(max(extcap, 2)))) + 1):
            mid = (lo + hi) // 2
            mv = ext[jnp.clip(mid, 0, extcap - 1)]
            go = (mv <= target) if right else (mv < target)
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        return lo

    def off(x):
        return _range_value_offset(x, c.dtype)

    fr = w.frame
    running = fr.start.kind == "preceding" and fr.start.offset is None
    lo_idx = None
    if not running:
        if fr.start.kind == "preceding":
            lo_idx = bisect(key - off(fr.start.offset), right=False)
        elif fr.start.kind == "current":
            lo_idx = bisect(key, right=False)
        else:  # following with offset
            lo_idx = bisect(key + off(fr.start.offset), right=False)
    if fr.end.kind == "current":
        hi_idx = bisect(key, right=True) - 1
    elif fr.end.kind == "following":
        hi_idx = bisect(key + off(fr.end.offset), right=True) - 1
    else:  # preceding end with offset
        hi_idx = bisect(key - off(fr.end.offset), right=True) - 1

    flag_lo = jnp.int32(0)
    if lo_idx is not None:
        flag_lo = (
            jnp.any(alive & (lo_idx == 0)) & (row_off - H > 0)
        ).astype(jnp.int32)
    flag_hi = (
        jnp.any(alive & (hi_idx >= qlim - 1)) & (row_off + nloc < N)
    ).astype(jnp.int32)
    # NULL order keys break the plane's monotonicity (they sort by null
    # rank, not by their stored value), so the per-shard bisect could
    # diverge from the single-device engine's — flag and gather instead
    flag_null = jnp.any(alive & ~c.valid).astype(jnp.int32)
    return lo_idx, hi_idx, flag_lo | flag_hi | flag_null


def _framed_window_aggregate(f, w, varg, mask, ctx):
    """Explicit frame over the mesh (no PARTITION BY): ROWS frames
    [i+a, i+b] read at most _DIST_FRAME_HALO rows beyond the shard edge,
    served by `_halo_ext`; RANGE frames bisect the halo-extended key plane
    (_range_ext_bounds) and flag windows wider than the halo; running
    frames (UNBOUNDED PRECEDING) add the preceding-shard totals like the
    default frame does.  Mirrors the local `_window_aggregate_range` null
    semantics exactly.  Returns (data, valid, overflow)."""
    from ..ops.aggregate import _to_float

    H = _DIST_FRAME_HALO
    fcap, alive = ctx["fcap"], ctx["alive"]
    prefix_sum_across = ctx["prefix_sum_across"]
    ar = jnp.arange(fcap)
    ovf = jnp.int32(0)

    if w.frame.units == "range":
        lo_idx, hi_idx, ovf = _range_ext_bounds(w, ctx["t"], ctx)
        running = lo_idx is None
    else:
        a, b = _frame_deltas(w.frame)
        hi_idx = ar + H + b
        running = a is None
        lo_idx = None if running else ar + H + a

    cnt_ext = _halo_ext(mask.astype(jnp.int64), jnp.int64(0), ctx)
    ccnt = jnp.cumsum(cnt_ext)

    def ext_sum(c, lo_i, hi_i):
        hi_v = c[jnp.clip(hi_i, 0, c.shape[0] - 1)]
        lo_ok = lo_i - 1 >= 0
        lo_v = jnp.where(
            lo_ok, c[jnp.clip(lo_i - 1, 0, c.shape[0] - 1)], jnp.zeros((), c.dtype)
        )
        return jnp.where(hi_i >= lo_i, hi_v - lo_v, jnp.zeros((), c.dtype))

    if running:
        # running frame: everything before this shard + ext prefix to hi
        cnt = prefix_sum_across(jnp.sum(mask.astype(jnp.int64))) + ext_sum(
            ccnt, jnp.full(fcap, H), hi_idx
        )
    else:
        cnt = ext_sum(ccnt, lo_idx, hi_idx)

    if f == "count":
        return cnt, alive, ovf
    has = cnt > 0

    if f in ("sum", "avg", "mean"):
        if f == "sum":
            acc = varg.data.astype(w.dtype.storage_np_dtype())
            x = jnp.where(mask, acc, jnp.zeros((), acc.dtype))
        else:
            x = jnp.where(mask, _to_float(varg.data, varg.dtype), 0.0)
        cx = jnp.cumsum(_halo_ext(x, jnp.zeros((), x.dtype), ctx))
        if running:
            s = prefix_sum_across(jnp.sum(x)) + ext_sum(
                cx, jnp.full(fcap, H), hi_idx
            )
        else:
            s = ext_sum(cx, lo_idx, hi_idx)
        if f == "sum":
            return s, alive & has, ovf
        return s / jnp.maximum(cnt, 1), alive & has, ovf

    # min / max
    from ..ops.window import _range_minmax

    opfn = jnp.minimum if f == "min" else jnp.maximum
    if varg.dtype.is_float:
        neutral = jnp.inf if f == "min" else -jnp.inf
        x = jnp.where(mask, varg.data, neutral)
    else:
        ordk = K.orderable_key(varg.data, varg.dtype)
        neutral = jnp.asarray(
            jnp.iinfo(ordk.dtype).max if f == "min" else jnp.iinfo(ordk.dtype).min,
            ordk.dtype,
        )
        x = jnp.where(mask, ordk, neutral)
    ext = _halo_ext(x, jnp.asarray(neutral, x.dtype), ctx)
    extcap = fcap + 2 * H
    if running:
        # prior shards reduce wholly; the ext's tail region is a subset of
        # them, so including it in the running reduce is idempotent
        me, ndev = ctx["me"], ctx["ndev"]
        g = jax.lax.all_gather(
            (jnp.min if f == "min" else jnp.max)(x), AXIS
        ).reshape(-1)
        prior = (jnp.min if f == "min" else jnp.max)(
            jnp.where(jnp.arange(ndev) < me, g, neutral)
        )
        run = jax.lax.cummin(ext) if f == "min" else jax.lax.cummax(ext)
        out = opfn(prior, run[jnp.clip(hi_idx, 0, extcap - 1)])
    else:
        out = _range_minmax(ext, lo_idx, hi_idx, extcap, opfn, neutral)
    return out.astype(varg.dtype.storage_np_dtype()), alive & has, ovf


def dist_window_global(st: ShardedTable, window_exprs):
    """Windows WITHOUT PARTITION BY over the mesh — the case the reference
    pins to a single partition (windows/window_agg_exec.rs requires
    SinglePartition; our executor used to gather the whole table).

    ORDER BY present: range-partition rows by the ORDER BY keys
    (dist_sort — ties co-locate because routing uses the first key only),
    evaluate every window locally per shard, then apply O(ndev)-sized
    collective corrections: ranking functions add row/dense-rank prefix
    offsets, running aggregates add preceding-shard totals, lag/lead
    exchange a static-size edge halo, first/nth_value broadcast the global
    head rows.  No ORDER BY (plain whole-table aggregates): per-shard
    totals all-reduce, zero data movement.

    Returns (ShardedTable, overflow) like dist_window."""
    from ..ops.window import _running_max, _running_min_reverse
    from ..exprs.physical import PhysLit

    if not global_window_eligible(window_exprs):
        raise ExecutionError("dist_window_global: structure not eligible")
    # sort by the LONGEST order list; every expr's list is a prefix of it
    order_by = max((list(w.order_by) for w in window_exprs), key=len)
    ndev = st.ndev

    if order_by:
        sorted_st, s_ovf = dist_sort(st, order_by)
        if s_ovf > 0:
            return sorted_st, s_ovf
    else:
        sorted_st = st
    fcap = sorted_st.shard_cap
    ncols = len(sorted_st.datas)

    def body(nrows, *arrays):
        datas = list(arrays[:ncols])
        valids = list(arrays[ncols:])
        t = _local_view(sorted_st, datas, valids)
        nloc = nrows[0]
        ar = jnp.arange(fcap)
        alive = ar < nloc
        me = jax.lax.axis_index(AXIS)
        cnts = jax.lax.all_gather(nloc, AXIS).reshape(-1)  # [ndev]
        ends = jnp.cumsum(cnts)
        offsets = ends - cnts  # exclusive prefix: my first global row
        row_off = offsets[me]
        N = ends[ndev - 1]
        rn0 = row_off + ar  # global 0-based row number

        peer_cache: dict = {}

        def peers(oby):
            """(boundary, peer_start, peer_end) for one expr's ORDER BY
            list (a prefix of the global sort order) — ties never cross
            shards because routing uses the first key only."""
            sig = tuple(
                (str(s.expr), s.ascending, s.nulls_first) for s in oby
            )
            hit = peer_cache.get(sig)
            if hit is not None:
                return hit
            if not oby:
                b = jnp.zeros(fcap, bool).at[0].set(True)
                ps = jnp.zeros(fcap, ar.dtype)
                pe = jnp.maximum(nloc - 1, 0) * jnp.ones(fcap, ar.dtype)
                peer_cache[sig] = (b, ps, pe)
                return peer_cache[sig]
            boundary = jnp.zeros(fcap, bool).at[0].set(True)
            for s in oby:
                c = s.expr.evaluate(t)
                k = K.orderable_key(c.data, c.dtype)
                boundary = (
                    boundary
                    | (k != jnp.roll(k, 1))
                    | (c.valid != jnp.roll(c.valid, 1))
                )
            # dead rows carry arbitrary keys: force a boundary at the
            # first dead position so the last peer group ends at nloc-1
            boundary = (boundary | (ar == nloc)).at[0].set(True)
            ps = _running_max(jnp.where(boundary, ar, 0))
            nxt_b = jnp.roll(boundary, -1).at[fcap - 1].set(True)
            pe = _running_min_reverse(jnp.where(nxt_b, ar, fcap))
            peer_cache[sig] = (boundary, ps, pe)
            return peer_cache[sig]

        def prefix_sum_across(shard_total):
            """Exclusive prefix over shards of a per-shard scalar."""
            g = jax.lax.all_gather(shard_total, AXIS).reshape(-1)
            return jnp.sum(jnp.where(jnp.arange(ndev) < me, g, 0))

        out_d: list[jnp.ndarray] = []
        out_v: list[jnp.ndarray] = []
        # RANGE-frame halo-coverage flag (max-reduced across shards on the
        # way out; nonzero => the executor falls back to the gather)
        frame_ovf = [jnp.int32(0)]
        for w in window_exprs:
            f = w.fun
            if f == "row_number":
                out_d.append((rn0 + 1).astype(jnp.uint64))
                out_v.append(alive)
                continue
            if f == "rank":
                _, ps, _ = peers(w.order_by)
                out_d.append((row_off + ps + 1).astype(jnp.uint64))
                out_v.append(alive)
                continue
            if f == "dense_rank":
                b, _, _ = peers(w.order_by)
                local_d = jnp.cumsum(b.astype(jnp.int64))
                d_off = prefix_sum_across(jnp.sum(b & alive))
                out_d.append((d_off + local_d).astype(jnp.uint64))
                out_v.append(alive)
                continue
            if f == "percent_rank":
                _, ps, _ = peers(w.order_by)
                grank = (row_off + ps).astype(jnp.float64)  # rank - 1
                denom = jnp.maximum(N - 1, 1).astype(jnp.float64)
                out_d.append(grank / denom)
                out_v.append(alive)
                continue
            if f == "cume_dist":
                _, _, pe = peers(w.order_by)
                le = (row_off + pe + 1).astype(jnp.float64)
                out_d.append(le / jnp.maximum(N, 1).astype(jnp.float64))
                out_v.append(alive)
                continue
            if f == "ntile":
                nt = w.args[0].evaluate(t).data.astype(jnp.int64)
                bucket = (rn0 * nt) // jnp.maximum(N, 1) + 1
                out_d.append(bucket.astype(jnp.uint64))
                out_v.append(alive)
                continue
            if f in ("lag", "lead"):
                v = w.args[0].evaluate(t)
                koff = 1
                if len(w.args) > 1:
                    koff = int(w.args[1].value.value or 0)
                E = max(koff, 1)
                je = jnp.arange(E)
                if f == "lag":
                    # halo: every shard's last-E rows, indexed by global pos
                    e_idx = jnp.clip(nloc - E + je, 0, fcap - 1).astype(
                        jnp.int32
                    )
                    e_ok = (nloc - E + je) >= 0
                    g_d = jax.lax.all_gather(v.data[e_idx], AXIS)
                    g_v = jax.lax.all_gather(v.valid[e_idx] & e_ok, AXIS)
                    # prev_buf[j] = value at global position row_off - E + j
                    p = row_off - E + je
                    src_s = jnp.sum(
                        ends[None, :] <= p[:, None], axis=1
                    ).astype(jnp.int32)
                    src_s = jnp.clip(src_s, 0, ndev - 1)
                    j2 = p - offsets[src_s] - (cnts[src_s] - E)
                    j2c = jnp.clip(j2, 0, E - 1).astype(jnp.int32)
                    buf_d = g_d[src_s, j2c]
                    buf_v = g_v[src_s, j2c] & (p >= 0) & (j2 >= 0) & (j2 < E)
                    src = ar - koff
                    remote = src < 0
                    src_c = jnp.clip(src, 0, fcap - 1).astype(jnp.int32)
                    rbuf = jnp.clip(src + E, 0, E - 1).astype(jnp.int32)
                    data = jnp.where(remote, buf_d[rbuf], v.data[src_c])
                    valid = jnp.where(
                        remote,
                        buf_v[rbuf] & (rn0 - koff >= 0),
                        v.valid[src_c] & (src >= 0),
                    )
                else:  # lead
                    e_idx = jnp.clip(je, 0, fcap - 1).astype(jnp.int32)
                    e_ok = je < nloc
                    g_d = jax.lax.all_gather(v.data[e_idx], AXIS)
                    g_v = jax.lax.all_gather(v.valid[e_idx] & e_ok, AXIS)
                    # next_buf[j] = value at global position row_off+nloc+j
                    p = row_off + nloc + je
                    src_s = jnp.sum(
                        ends[None, :] <= p[:, None], axis=1
                    ).astype(jnp.int32)
                    src_s = jnp.clip(src_s, 0, ndev - 1)
                    j2 = p - offsets[src_s]
                    j2c = jnp.clip(j2, 0, E - 1).astype(jnp.int32)
                    buf_d = g_d[src_s, j2c]
                    buf_v = (
                        g_v[src_s, j2c] & (p < N) & (j2 >= 0) & (j2 < E)
                    )
                    src = ar + koff
                    remote = src >= nloc
                    src_c = jnp.clip(src, 0, fcap - 1).astype(jnp.int32)
                    rbuf = jnp.clip(src - nloc, 0, E - 1).astype(jnp.int32)
                    data = jnp.where(remote, buf_d[rbuf], v.data[src_c])
                    valid = jnp.where(
                        remote,
                        buf_v[rbuf] & (rn0 + koff < N),
                        v.valid[src_c],
                    )
                out_d.append(data)
                out_v.append(valid & alive)
                continue
            if f == "first_value":
                v = w.args[0].evaluate(t)
                g_d = jax.lax.all_gather(v.data[0], AXIS).reshape(-1)
                g_v = jax.lax.all_gather(
                    v.valid[0] & (nloc > 0), AXIS
                ).reshape(-1)
                has = cnts > 0
                first_s = jnp.argmax(has)  # first shard with rows
                val = g_d[first_s]
                vv = g_v[first_s] & jnp.any(has)
                out_d.append(jnp.full(fcap, val))
                out_v.append(alive & vv)
                continue
            if f == "last_value":
                # the single-device engine uses the PARTITION end for
                # last_value (window.py _eval_window) — mirror it: the
                # global last row, from the last shard with rows
                v = w.args[0].evaluate(t)
                last_i = jnp.clip(nloc - 1, 0, fcap - 1).astype(jnp.int32)
                g_d = jax.lax.all_gather(v.data[last_i], AXIS).reshape(-1)
                g_v = jax.lax.all_gather(
                    v.valid[last_i] & (nloc > 0), AXIS
                ).reshape(-1)
                has = cnts > 0
                rev = has[::-1]
                last_s = ndev - 1 - jnp.argmax(rev)  # last shard with rows
                out_d.append(jnp.full(fcap, g_d[last_s]))
                out_v.append(alive & g_v[last_s] & jnp.any(has))
                continue
            if f == "nth_value":
                # mirrors the local engine: the value at partition-relative
                # position n-1 (= global row n-1), null when out of range
                v = w.args[0].evaluate(t)
                n = w.args[1].evaluate(t).data[0].astype(jnp.int64)
                p = n - 1  # global 0-based source position
                mine = (row_off <= p) & (p < row_off + nloc)
                li = jnp.clip(p - row_off, 0, fcap - 1).astype(jnp.int32)
                g_d = jax.lax.all_gather(
                    jnp.where(mine, v.data[li], jnp.zeros((), v.data.dtype)),
                    AXIS,
                ).reshape(-1)
                g_v = jax.lax.all_gather(mine & v.valid[li], AXIS).reshape(-1)
                src_s = jnp.argmax(
                    jax.lax.all_gather(mine, AXIS).reshape(-1)
                )
                val = g_d[src_s]
                vv = jnp.any(g_v)
                out_d.append(jnp.full(fcap, val))
                out_v.append(alive & vv & (p >= 0) & (p < N))
                continue
            # running / whole-table aggregates over the default frame
            # [global row 0, current peer end] (or the whole table without
            # ORDER BY): local prefix at peer_end + preceding-shard totals
            varg = w.args[0].evaluate(t) if w.args else None
            mask = (
                (varg.valid & alive) if varg is not None else alive
            )
            if w.frame is not None:
                d, v_, f_ovf = _framed_window_aggregate(
                    f, w, varg, mask,
                    dict(nloc=nloc, fcap=fcap, ndev=ndev, me=me,
                         row_off=row_off, ends=ends, offsets=offsets, N=N,
                         alive=alive, prefix_sum_across=prefix_sum_across,
                         t=t),
                )
                frame_ovf[0] = frame_ovf[0] | f_ovf
                out_d.append(d)
                out_v.append(v_)
                continue
            w_ordered = bool(w.order_by)
            if w_ordered:
                _, _, pe = peers(w.order_by)
                pe32 = jnp.clip(pe, 0, fcap - 1).astype(jnp.int32)

            def frame_sum(x):
                """Per-row sum over the default frame: with ORDER BY the
                frame is [global row 0, peer end] (preceding shards whole +
                local prefix); without, the WHOLE table (all-shard total)."""
                total = jnp.sum(x)
                if w_ordered:
                    return prefix_sum_across(total) + jnp.cumsum(x)[pe32]
                g = jax.lax.all_gather(total, AXIS).reshape(-1)
                return jnp.full(fcap, jnp.sum(g))

            gcount = frame_sum(mask.astype(jnp.int64))
            if f == "count":
                out_d.append(gcount)
                out_v.append(alive)
                continue
            has = gcount > 0
            if f == "sum":
                acc = varg.data.astype(w.dtype.storage_np_dtype())
                x = jnp.where(mask, acc, jnp.zeros((), acc.dtype))
                out_d.append(frame_sum(x))
                out_v.append(alive & has)
                continue
            if f in ("avg", "mean"):
                from ..ops.aggregate import _to_float

                fx = _to_float(varg.data, varg.dtype)
                x = jnp.where(mask, fx, 0.0)
                out_d.append(frame_sum(x) / jnp.maximum(gcount, 1))
                out_v.append(alive & has)
                continue
            if f in ("min", "max"):
                opfn = jnp.minimum if f == "min" else jnp.maximum
                redfn = jnp.min if f == "min" else jnp.max
                if varg.dtype.is_float:
                    neutral = jnp.inf if f == "min" else -jnp.inf
                    x = jnp.where(mask, varg.data, neutral)
                else:
                    vok = K.orderable_key(varg.data, varg.dtype)
                    neutral = jnp.asarray(
                        jnp.iinfo(vok.dtype).max
                        if f == "min"
                        else jnp.iinfo(vok.dtype).min,
                        vok.dtype,
                    )
                    x = jnp.where(mask, vok, neutral)
                g = jax.lax.all_gather(redfn(x), AXIS).reshape(-1)
                if w_ordered:
                    run = (
                        jax.lax.cummin(x) if f == "min" else jax.lax.cummax(x)
                    )
                    prior = redfn(
                        jnp.where(jnp.arange(ndev) < me, g, neutral)
                    )
                    out = opfn(prior, run[pe32])
                else:
                    out = jnp.full(fcap, redfn(g))
                out_d.append(out.astype(varg.dtype.storage_np_dtype()))
                out_v.append(alive & has)
                continue
            raise ExecutionError(f"dist_window_global: '{f}' unreachable")

        return (
            nrows,
            *[d for d in datas],
            *out_d,
            *[v for v in valids],
            *out_v,
            frame_ovf[0].reshape(1),
        )

    kout = ncols + len(window_exprs)
    fn = _shard_map(
        sorted_st.mesh,
        body,
        in_specs=_specs(1 + 2 * ncols),
        out_specs=_specs(1 + 2 * kout + 1),
    )
    out = jax.jit(fn)(sorted_st.nrows, *sorted_st.datas, *sorted_st.valids)
    nrows, rest, ovf_plane = out[0], out[1:-1], out[-1]
    out_names = list(st.names) + [w.name for w in window_exprs]
    out_dtypes = list(st.dtypes) + [w.dtype for w in window_exprs]
    out_dicts = list(st.dicts) + [_win_dict(w, st) for w in window_exprs]
    st2 = ShardedTable(
        out_names,
        out_dtypes,
        out_dicts,
        list(rest[:kout]),
        list(rest[kout:]),
        nrows,
        sorted_st.mesh,
        fcap,
    )
    _attach_info(
        st2,
        op="dist_window_global",
        mode="range_order" if order_by else "all_reduce",
        recv_cap=fcap,
        retries=0,
        exchange_bytes=(
            _exchange_bytes(st.datas, ndev, fcap // ndev) if order_by else 0
        ),
    )
    # RANGE-frame halo coverage: -1 when some row's value window reaches
    # past the exchanged halo (or a null order key breaks the bisect) —
    # a DATA condition, so the executor degrades to the gather even in
    # strict mode instead of serving a truncated frame.  One host sync,
    # only when RANGE frames exist (the plane is all-zero otherwise).
    ovf = 0
    if any(
        w.frame is not None and w.frame.units == "range"
        for w in window_exprs
        if w.fun in _GLOBAL_WIN_AGGS
    ):
        ovf = -1 if int(jnp.max(ovf_plane)) > 0 else 0
    return st2, ovf


def _win_dict(w, st: ShardedTable):
    """Dictionary for a window output column: value-passing functions
    (first/last/nth_value, lag/lead, min/max) re-emit their argument's
    codes; everything else is numeric."""
    if w.fun in (
        "first_value", "last_value", "nth_value", "lag", "lead", "min", "max"
    ) and w.args:
        sample = _local_view(
            st,
            [jnp.zeros(1, d.dtype) for d in st.datas],
            [jnp.zeros(1, bool) for _ in st.valids],
        )
        return w.args[0].evaluate(sample).dictionary
    return None


# ---------------------------------------------------------------------------
# UNION on the mesh
# ---------------------------------------------------------------------------


def dist_union(parts: list[ShardedTable], schema) -> ShardedTable:
    """Shard-wise UNION ALL: each shard concatenates its own segments of
    every input and compacts with one co-sort — no gather, no host round
    trip (UnionExec just concatenates child partition lists, union.rs:34;
    the shard IS the partition here).

    Casting to the target schema and string-dictionary merging happen at
    trace time (elementwise LUT remaps on the sharded arrays), mirroring
    the single-device concat_tables."""
    from ..exprs.physical import CVec, cast_column

    mesh = parts[0].mesh
    fields = schema.fields
    # per-field: cast every part's column, then merge dictionaries
    col_data: list[list[jnp.ndarray]] = []   # [field][part]
    col_valid: list[list[jnp.ndarray]] = []
    out_dicts = []
    for i, f in enumerate(fields):
        pieces = [
            cast_column(
                CVec(p.dtypes[i], p.datas[i], p.valids[i], p.dicts[i]), f.dtype
            )
            for p in parts
        ]
        if f.dtype.is_string:
            from ..columnar.dictionary import StringDict

            val_arrays = [
                c.dictionary.values.astype(str)
                for c in pieces
                if c.dictionary is not None and len(c.dictionary) > 0
            ]
            all_vals = (
                np.unique(np.concatenate(val_arrays))
                if val_arrays
                else np.array([], dtype=str)
            )
            merged = StringDict(all_vals.astype(object))
            remapped = []
            for c in pieces:
                if c.dictionary is None or len(c.dictionary) == 0:
                    remapped.append(c)
                    continue
                lut = np.searchsorted(
                    all_vals, c.dictionary.values.astype(str)
                ).astype(np.int32)
                d2 = jnp.asarray(lut)[jnp.clip(c.data, 0, len(lut) - 1)]
                remapped.append(CVec(f.dtype, d2, c.valid, merged))
            pieces = remapped
            out_dicts.append(merged)
        else:
            out_dicts.append(None)
        col_data.append([c.data for c in pieces])
        col_valid.append([c.valid for c in pieces])

    caps = [p.shard_cap for p in parts]
    out_cap = round_capacity(sum(caps))
    nparts = len(parts)
    nf = len(fields)

    def body(*arrays):
        nrows = arrays[:nparts]
        flat = arrays[nparts:]
        # flat layout: for each field, nparts datas; then for each field,
        # nparts valids
        seg_alive = jnp.concatenate(
            [jnp.arange(caps[p]) < nrows[p][0] for p in range(nparts)]
        )
        pad = out_cap - seg_alive.shape[0]
        if pad:
            seg_alive = jnp.concatenate([seg_alive, jnp.zeros(pad, bool)])
        datas, valids = [], []
        for i in range(nf):
            d = jnp.concatenate(list(flat[i * nparts : (i + 1) * nparts]))
            v = jnp.concatenate(
                list(flat[(nf + i) * nparts : (nf + i + 1) * nparts])
            )
            if pad:
                d = jnp.concatenate([d, jnp.zeros(pad, d.dtype)])
                v = jnp.concatenate([v, jnp.zeros(pad, bool)])
            datas.append(d)
            valids.append(v & seg_alive)
        out_d, out_v, cnt = K.filter_compact(
            tuple(datas), tuple(valids), seg_alive, jnp.int64(out_cap)
        )
        return (cnt.reshape(1).astype(jnp.int64), *out_d, *out_v)

    fn = _shard_map(
        mesh,
        body,
        in_specs=_specs(nparts + 2 * nf * nparts),
        out_specs=_specs(1 + 2 * nf),
    )
    flat_in = (
        [p.nrows for p in parts]
        + [col_data[i][p] for i in range(nf) for p in range(nparts)]
        + [col_valid[i][p] for i in range(nf) for p in range(nparts)]
    )
    out = jax.jit(fn)(*flat_in)
    return _attach_info(
        ShardedTable(
            [f.name for f in fields],
            [f.dtype for f in fields],
            out_dicts,
            list(out[1 : 1 + nf]),
            list(out[1 + nf :]),
            out[0],
            mesh,
            out_cap,
        ),
        op="dist_union",
        mode="shard_concat",
        recv_cap=out_cap,
        exchange_bytes=0,
    )


# ---------------------------------------------------------------------------
# LIMIT / OFFSET on the mesh
# ---------------------------------------------------------------------------


def dist_limit(st: ShardedTable, n: int) -> ShardedTable:
    """Global LIMIT without moving a row: ShardedTable.to_table gathers in
    shard order, so the first N global rows are each shard's prefix of
    clip(N - rows_on_earlier_shards, 0, local_n).  One all_gather of the
    counts, then every shard truncates its live count (rows stay
    front-compacted; no data shuffle).  Matches GlobalLimitExec
    (limit.rs:44) + the per-shard local-limit pushdown the distributed
    planner applies on the DCN path."""
    ncols = len(st.datas)
    ndev = st.ndev

    def body(nrows, *arrays):
        counts = jax.lax.all_gather(nrows, AXIS).reshape(-1)
        me = jax.lax.axis_index(AXIS)
        before = jnp.sum(jnp.where(jnp.arange(ndev) < me, counts, 0))
        keep = jnp.clip(jnp.int64(n) - before, 0, nrows[0])
        return (keep.reshape(1).astype(jnp.int64), *arrays)

    fn = _shard_map(
        st.mesh, body, in_specs=_specs(1 + 2 * ncols), out_specs=_specs(1 + 2 * ncols)
    )
    out = jax.jit(fn)(st.nrows, *st.datas, *st.valids)
    return ShardedTable(
        list(st.names), list(st.dtypes), list(st.dicts),
        list(out[1 : 1 + ncols]), list(out[1 + ncols :]),
        out[0], st.mesh, st.shard_cap,
    )


def dist_skip(st: ShardedTable, n: int) -> ShardedTable:
    """Global OFFSET (fork skip.rs:41): shard i drops
    clip(N - rows_on_earlier_shards, 0, local_n) rows from its front and
    re-compacts with one co-sort (bench/MICRO.md rule 7)."""
    ncols = len(st.datas)
    ndev = st.ndev
    cap = st.shard_cap

    def body(nrows, *arrays):
        datas = list(arrays[:ncols])
        valids = list(arrays[ncols:])
        counts = jax.lax.all_gather(nrows, AXIS).reshape(-1)
        me = jax.lax.axis_index(AXIS)
        before = jnp.sum(jnp.where(jnp.arange(ndev) < me, counts, 0))
        drop = jnp.clip(jnp.int64(n) - before, 0, nrows[0])
        ar = jnp.arange(cap)
        keep = (ar >= drop) & (ar < nrows[0])
        cnt = nrows[0] - drop
        _, moved = K.cosort((~keep,), tuple(datas) + tuple(valids))
        live = ar < cnt
        out_d = list(moved[:ncols])
        out_v = [v & live for v in moved[ncols:]]
        return (cnt.reshape(1).astype(jnp.int64), *out_d, *out_v)

    fn = _shard_map(
        st.mesh, body, in_specs=_specs(1 + 2 * ncols), out_specs=_specs(1 + 2 * ncols)
    )
    out = jax.jit(fn)(st.nrows, *st.datas, *st.valids)
    return ShardedTable(
        list(st.names), list(st.dtypes), list(st.dicts),
        list(out[1 : 1 + ncols]), list(out[1 + ncols :]),
        out[0], st.mesh, st.shard_cap,
    )


def dist_aggregate_exact(
    st: ShardedTable,
    op,
    bucket_cap: int | None = None,
):
    """Aggregate with group-hash PLACEMENT instead of partial states:
    all_to_all raw rows by group-key hash (each group lands whole on one
    shard), then the single-device traced aggregate runs per shard — so
    semantics needing global sets per group (DISTINCT aggregates,
    distinct_expressions.rs keeps the value set as state) are exact without
    shipping set states.  Costs a full-row shuffle where dist_aggregate
    ships one state row per group; used only when states don't merge.

    ``op`` is the single-device HashAggregateExec (mode 'single').
    Returns (ShardedTable, overflow) like dist_window.
    """
    from ..physical.stage_compiler import _traced_aggregate

    group_expr, aggr_expr = op.group_expr, op.aggr_expr
    if not group_expr:
        raise ExecutionError(
            "dist_aggregate_exact: no group keys — one shard would hold "
            "every row; the executor's fallback gathers instead"
        )
    ndev = st.ndev
    ncols = len(st.datas)
    cap = st.shard_cap
    auto = bucket_cap is None
    B = bucket_cap or default_bucket(cap, ndev)
    fcap = ndev * B

    out_names = [n for _, n in group_expr] + [a.name for a in aggr_expr]
    out_dtypes = [e.dtype for e, _ in group_expr] + [
        a.return_type() for a in aggr_expr
    ]

    def body(nrows, *arrays):
        datas = list(arrays[:ncols])
        valids = list(arrays[ncols:])
        t = _local_view(st, datas, valids)
        kcols = [e.evaluate(t) for e, _ in group_expr]
        khash = K.hash_columns(
            [K.hashable_key(c.data, c.dtype) for c in kcols],
            [c.valid for c in kcols],
        )
        sh_d, sh_v, new_n, ovf = shuffle_by_hash(
            datas, valids, nrows, khash, ndev, B
        )
        cols2 = [
            Column(dt, d, v, dic)
            for dt, dic, d, v in zip(st.dtypes, st.dicts, sh_d, sh_v)
        ]
        t2 = Table(list(st.names), cols2, 0)
        alive2 = jnp.arange(fcap) < new_n[0]
        out_d, out_v, ngroups, _meta = _traced_aggregate(op, t2, alive2, fcap)
        return (
            jnp.asarray(ngroups).reshape(1).astype(jnp.int64),
            jnp.asarray(ovf).reshape(1).astype(jnp.int64),
            *out_d,
            *out_v,
        )

    k = len(out_names)
    fn = _shard_map(
        st.mesh,
        body,
        in_specs=_specs(1 + 2 * ncols),
        out_specs=_specs(2 + 2 * k),
    )
    out = jax.jit(fn)(st.nrows, *st.datas, *st.valids)
    nrows, overflow, rest = out[0], out[1], out[2:]
    ovf = int(jnp.max(overflow))
    if ovf > 0 and auto:
        # hot group key under raw-row placement: one exact-deficit retry
        st2, r_ovf = dist_aggregate_exact(
            st, op, bucket_cap=round_capacity(B + ovf)
        )
        st2.exchange_info["retries"] = st2.exchange_info.get("retries", 0) + 1
        return st2, r_ovf
    dicts = list(_group_dicts(group_expr, st)) + [
        _agg_dict(a, st) for a in aggr_expr
    ]
    st2 = ShardedTable(
        out_names,
        out_dtypes,
        dicts,
        list(rest[:k]),
        list(rest[k:]),
        nrows,
        st.mesh,
        fcap,
    )
    _attach_info(
        st2,
        op="dist_aggregate_exact",
        mode="group_hash_placement",
        bucket_cap=B,
        recv_cap=fcap,
        retries=0,
        exchange_bytes=_exchange_bytes(st.datas, ndev, B),
    )
    return st2, ovf
