"""HashJoinExec / CrossJoinExec equivalents.

Reference: /root/reference/datafusion/src/physical_plan/hash_join.rs (2,203
LoC; JoinHashMap keyed by u64 hash with probe-time collision check,
build_join_indexes :649, build_batch_from_indices :564, visited bitmap for
outer joins :407) and cross_join.rs:52.

TPU-native design (SURVEY.md §7): no pointer-chasing hash table.  The build
side is co-sorted by a 64-bit key hash (one variadic XLA sort); probe ranks
come from a merge-rank co-sort of [probe ++ build] hashes plus build-side
run lengths (kernels.join_probe_counts — `searchsorted` lowers 20x slower
on TPU); candidate pairs are materialized by a cumsum/merge-rank
run-expansion, and exact key equality (+ optional residual non-equi filter)
prunes hash collisions — the vectorized analogue of `equal_rows`
(hash_join.rs:813).  All six join types (Inner/Left/Right/Full/Semi/Anti,
logical_plan/plan.rs:36-49) derive from the same candidate set in ONE
jitted program per phase: probe-side outer rows come from prefix sums over
the contiguous candidate runs, build-side ones from a scatter-or visited
mask.

Output capacity is data-dependent: under a speculation window
(kernels.py) inner/semi/anti joins size to the probe capacity with a
device-side overflow flag (zero host syncs; exact for FK joins); otherwise
the candidate total is pulled once to size the buffer — the
capacity-estimation + overflow/retry strategy of SURVEY.md §7 hard
part (a).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table, round_capacity
from ..errors import InternalError
from ..exprs.physical import PhysicalExpr, harmonize_strings
from ..types import Field, Schema
from . import kernels as K
from .base import ExecutionPlan

JOIN_TYPES = ("inner", "left", "right", "full", "semi", "anti")

# FK-specialized phase B checks up to this many candidates per probe
# in-place (no run expansion).  2 tolerates the ~n^2/2^32 hash-fold
# collisions that make a true PK build side show fan-out 2 at SF>=1;
# genuine fan-out beyond it (or >1 VERIFIED match on a non-semi/anti
# join) trips the overflow flag and relearns fk=False.
FK_MAX_RUN = 2

# below this capacity, padding costs less than the D2H count sync that a
# shrink needs (~28 ms through a remote-TPU tunnel)
SHRINK_SYNC_MIN_CAP = 1 << 17


class HashJoinExec(ExecutionPlan):
    """Equi-join.  Probe side = left input, build side = right input.

    `on` pairs physical key exprs (left_expr, right_expr); `filter` is an
    optional residual predicate planned against the combined schema."""

    def __init__(
        self,
        left: ExecutionPlan,
        right: ExecutionPlan,
        on: list[tuple[PhysicalExpr, PhysicalExpr]],
        join_type: str = "inner",
        filter: PhysicalExpr | None = None,
    ):
        super().__init__()
        if join_type not in JOIN_TYPES:
            raise InternalError(f"bad join type {join_type}")
        self.left = left
        self.right = right
        self.on = on
        self.join_type = join_type
        self.filter = filter

    def schema(self) -> Schema:
        if self.join_type in ("semi", "anti"):
            return self.left.schema()
        lf = self.left.schema().fields
        rf = self.right.schema().fields
        return Schema(list(lf) + list(rf))

    def children(self):
        return [self.left, self.right]

    def with_new_children(self, c):
        return HashJoinExec(c[0], c[1], self.on, self.join_type, self.filter)

    # ------------------------------------------------------------------
    def _execute(self) -> Table:
        lt = self.left.execute()
        rt = self.right.execute()
        # joins sort/probe at CAPACITY; an upstream speculative output can
        # carry a huge buffer around a tiny live count (HAVING results,
        # selective filters).  One count sync each is cheaper than sorting
        # megabytes of padding once capacities reach this size.
        lt = lt.shrink_to_fit(only_if_above=SHRINK_SYNC_MIN_CAP)
        rt = rt.shrink_to_fit(only_if_above=SHRINK_SYNC_MIN_CAP)
        return join_tables(
            lt, rt, self.on, self.join_type, self.filter, self.metrics,
            force_exact=getattr(self, "_force_exact", False),
        )

    def _display_line(self):
        on = ", ".join(f"{l!r}={r!r}" for l, r in self.on)
        f = f" filter={self.filter!r}" if self.filter is not None else ""
        return f"HashJoinExec[{self.join_type}]: on=[{on}]{f}"


def join_tables(
    lt: Table, rt: Table, on, join_type: str, filter, metrics=None,
    force_exact: bool = False,
) -> Table:
    """Equi-join dispatcher: every join type runs through the two-phase
    jitted path (count program, then one expand/verify/materialize
    program) — at most one host sync; inner/semi/anti run with zero under
    speculative sizing."""
    return _join_tables_jit(lt, rt, on, join_type, filter, metrics, force_exact)


# ---------------------------------------------------------------------------
# two-phase jitted join
# ---------------------------------------------------------------------------

# LRU: long sessions evict the coldest compiled join programs one at a
# time instead of nuking the whole cache (VERDICT r1 weak #6)
from collections import OrderedDict

_JOIN_JIT_CACHE: OrderedDict = OrderedDict()
_JOIN_JIT_CACHE_CAP = 512


def _cache_get(key):
    entry = _JOIN_JIT_CACHE.get(key)
    if entry is not None:
        _JOIN_JIT_CACHE.move_to_end(key)
    return entry


def _cache_put(key, entry):
    _JOIN_JIT_CACHE[key] = entry
    while len(_JOIN_JIT_CACHE) > _JOIN_JIT_CACHE_CAP:
        _JOIN_JIT_CACHE.popitem(last=False)


def _table_sig(t: Table):
    # the vrange-narrowing bit is a trace-time decision baked into cached
    # programs (K.orderable_key): same-shaped tables that differ in range
    # must not share a narrowed program (ADVICE r4 #2)
    return (
        tuple(t.names),
        tuple(
            (
                str(c.dtype),
                c.capacity,
                id(c.dictionary),
                K.vrange_narrows_i32(c.vrange),
            )
            for c in t.columns
        ),
    )


def _join_keys(ltv: Table, rtv: Table, on):
    """Evaluate + harmonize key columns (dictionary LUTs are trace-time
    constants; StringDict.merge memoizes so identities stay stable)."""
    lkeys, rkeys = [], []
    for le, re_ in on:
        lc = le.evaluate(ltv)
        rc = re_.evaluate(rtv)
        if lc.dtype.is_string and rc.dtype.is_string:
            lc, rc = harmonize_strings(lc, rc)
        lkeys.append(lc)
        rkeys.append(rc)
    return lkeys, rkeys


# builds with at most this many (host-known) live rows take the
# direct-compare semi/anti path (no hashes, no sorts, no candidate
# expansion): a fori_loop of vectorized probe-vs-build-row compares,
# trip count = the actual build count.  Selective subqueries (HAVING,
# EXISTS rewrites) routinely hand a 6-row build against a million-row
# probe; sort-merge machinery there is almost pure overhead.
TINY_BUILD_ROWS = 256


def _tiny_semi_anti(lt: Table, rt: Table, on, join_type: str) -> Table:
    lcap, rcap = lt.capacity, rt.capacity
    key = ("T", _table_sig(lt), _table_sig(rt), repr(on), join_type)
    entry = _cache_get(key)
    if entry is None:

        def program(ld, lv, nl, rd, rv, nr):
            ltv = _view(lt, ld, lv)
            rtv = _view(rt, rd, rv)
            lkeys, rkeys = _join_keys(ltv, rtv, on)
            lord = [K.orderable_key(c.data, c.dtype, c.vrange) for c in lkeys]
            rord = [K.orderable_key(c.data, c.dtype, c.vrange) for c in rkeys]
            lval = [c.valid for c in lkeys]
            rval = [c.valid for c in rkeys]

            def body(i, matched):
                eq = jnp.ones(lcap, dtype=bool)
                for lo_, lv_, ro_, rv_ in zip(lord, lval, rord, rval):
                    eq = eq & lv_ & rv_[i] & (lo_ == ro_[i])
                return matched | eq

            # live build rows are front-compacted: loop exactly nr rows
            # (dynamic trip count — one compiled program for any build
            # size at these shapes)
            matched = jax.lax.fori_loop(
                0,
                jnp.minimum(nr, rcap).astype(jnp.int32),
                body,
                jnp.zeros(lcap, dtype=bool),
            )
            keep = matched if join_type == "semi" else ~matched
            return K.filter_compact(ld, lv, keep, nl)

        entry = jax.jit(program)
        _cache_put(key, entry)

    ld = tuple(c.data for c in lt.columns)
    lv = tuple(c.valid for c in lt.columns)
    rd = tuple(c.data for c in rt.columns)
    rv = tuple(c.valid for c in rt.columns)
    out_d, out_v, cnt = entry(ld, lv, lt.nrows_dev, rd, rv, rt.nrows_dev)
    cols = [
        Column(c.dtype, d, v, c.dictionary)
        for c, d, v in zip(lt.columns, out_d, out_v)
    ]
    return Table(list(lt.names), cols, cnt)


def _join_tables_jit(lt, rt, on, join_type, filter, metrics=None, force_exact=False) -> Table:
    lcap, rcap = lt.capacity, rt.capacity
    base_key = (_table_sig(lt), _table_sig(rt), repr(on), join_type, repr(filter))
    if join_type in ("semi", "anti") and filter is None and lcap > rcap:
        if isinstance(rt._nrows, jax.core.Tracer):
            # whole-query trace: the build count is traced, so reuse the
            # decision the concrete runs recorded — the tiny program
            # itself is trace-pure (dynamic fori_loop trip count)
            tiny = bool(_cache_get(("TINY",) + base_key))
        else:
            tiny = (
                isinstance(rt._nrows, int)  # count already on host: free
                and rt.nrows <= TINY_BUILD_ROWS
            )
            if not tiny and lcap >= (1 << 20) and rcap <= 4096:
                # a floor-capacity build against a huge probe (HAVING /
                # EXISTS results): one count sync (~28 ms) decides whether
                # the direct-compare path can replace a probe-capacity
                # sort pass (the q18 semi join compacts 8M rows otherwise)
                tiny = rt.nrows <= TINY_BUILD_ROWS
            _cache_put(("TINY",) + base_key, tiny)
        if tiny:
            return _tiny_semi_anti(lt, rt, on, join_type)

    def trace_a(ld, lv, nl, rd, rv, nr, prep=None):
        ltv = _view(lt, ld, lv)
        rtv = _view(rt, rd, rv)
        lkeys, rkeys = _join_keys(ltv, rtv, on)
        # 32-bit folded hashes: half the sort width at native TPU ALU
        # width; collisions are discarded by exact verification
        lhash = K.hash_fold32(K.hash_columns(
            [K.hashable_key(c.data, c.dtype) for c in lkeys],
            [c.valid for c in lkeys],
        ))
        if prep is not None:
            # build side hashed/sorted ONCE outside the probe stream
            # (hash_join.rs:280-425 collect-once build): morsel loops
            # reuse it, so per-morsel cost scales with the morsel
            sorted_hash, build_order, rl = prep[0], prep[1], prep[2]
        else:
            rhash = K.hash_fold32(K.hash_columns(
                [K.hashable_key(c.data, c.dtype) for c in rkeys],
                [c.valid for c in rkeys],
            ))
            sorted_hash, build_order = K.join_build_sort(rhash, nr)
            rl = None
        probe_ok = jnp.arange(lcap) < nl
        for c in lkeys:
            probe_ok = probe_ok & c.valid
        if K.probe_binary():
            if rl is None:
                rl = K.build_run_lengths(sorted_hash)
            lo, counts = K.join_probe_counts_binary(
                sorted_hash, rl, lhash, probe_ok, nr
            )
        else:
            lo, counts = K.join_probe_counts(sorted_hash, lhash, probe_ok, nr)
        stats = K.candidate_stats(counts)
        return lo, counts, build_order, stats

    ld = tuple(c.data for c in lt.columns)
    lv = tuple(c.valid for c in lt.columns)
    rd = tuple(c.data for c in rt.columns)
    rv = tuple(c.valid for c in rt.columns)
    nl, nr = lt.nrows_dev, rt.nrows_dev

    # build-side preparation, hoisted for streamed joins: a table marked
    # _reused_build (the HBM-resident build of a morsel-streamed join,
    # physical/morsel.py) is hashed + sorted ONCE and every probe morsel
    # reuses (sorted_hash, build_order, run_lengths) — per-morsel work
    # then scales with the morsel, not the build (the reference collects
    # its build side once and streams probe batches, hash_join.rs:280-425)
    prep = None
    if getattr(rt, "_reused_build", False):
        pkey = (repr(on), tuple(id(c.dictionary) for c in lt.columns))
        cached_prep = getattr(rt, "_join_prep", None)
        if cached_prep is None or cached_prep[0] != pkey:
            pfn = _cache_get(("P",) + base_key)
            if pfn is None:

                def trace_prep(ld2, lv2, nl2, rd2, rv2, nr2):
                    ltv = _view(lt, ld2, lv2)
                    rtv = _view(rt, rd2, rv2)
                    _lk, rkeys = _join_keys(ltv, rtv, on)
                    rhash = K.hash_fold32(K.hash_columns(
                        [K.hashable_key(c.data, c.dtype) for c in rkeys],
                        [c.valid for c in rkeys],
                    ))
                    sh, bo = K.join_build_sort(rhash, nr2)
                    # phase B's verify keys too: evaluating them per
                    # probe morsel costs O(build) elementwise work each
                    # time (at SF10, several GB per morsel)
                    rord = tuple(
                        K.orderable_key(c.data, c.dtype, c.vrange)
                        for c in rkeys
                    )
                    rval = tuple(c.valid for c in rkeys)
                    return sh, bo, K.build_run_lengths(sh), rord, rval

                pfn = jax.jit(trace_prep)
                _cache_put(("P",) + base_key, pfn)
            rt._join_prep = (pkey, tuple(pfn(ld, lv, nl, rd, rv, nr)))
        prep = rt._join_prep[1]

    # speculative sizing: pick static capacities WITHOUT reading the
    # candidate total (a blocking D2H sync that also drains the dispatch
    # pipeline — ~28 ms + lost overlap per join through the TPU tunnel);
    # overflow flags are checked once per query by the speculation window
    # (kernels.py note), which reruns exactly if any join overflowed.
    # Two sources of a speculative capacity:
    #   - LEARNED (expand_cap, out_cap) from a previous exact-sized run of
    #     this same join shape: expand_cap sizes the candidate expansion
    #     (from the candidate total), out_cap right-sizes the OUTPUT (from
    #     the verified row count — a residual filter or hash collisions
    #     can leave far fewer rows than candidates).  Repeated queries run
    #     phases A and B fused into ONE program with zero syncs.
    #   - probe capacity, for fan-out<=1 types over small probes: only
    #     below SHRINK_SYNC_MIN_CAP because phase B runs entirely at
    #     expansion capacity, so a selective join over a large probe
    #     (q17: 778 pairs from a 1M-cap probe) would waste orders of
    #     magnitude more compute than the one sync the exact path costs.
    spec_caps = None
    if K.spec_active() and not force_exact:
        learned = _cache_get(("CAP",) + base_key)
        if learned is not None:
            spec_caps = learned
        elif join_type in ("inner", "semi", "anti") and lcap <= SHRINK_SYNC_MIN_CAP:
            spec_caps = (lcap, None, False)

    if spec_caps is not None:
        expand_cap, final_cap, fk = spec_caps
        ab_key = ("AB", expand_cap, final_cap, fk, prep is not None) + base_key
        entry_ab = _cache_get(ab_key)
        if entry_ab is None:
            tb = _make_trace_b(
                lt, rt, on, join_type, filter, lcap, rcap, expand_cap, final_cap,
                fk=fk,
            )

            def phase_ab(ld, lv, nl, rd, rv, nr, prep):
                lo, counts, build_order, stats = trace_a(
                    ld, lv, nl, rd, rv, nr, prep
                )
                out_d, out_v, cnt, bflag = tb(
                    ld, lv, nl, rd, rv, nr, lo, counts, build_order, prep
                )
                flag = bflag | (stats[0] > expand_cap).astype(jnp.int32)
                if fk:
                    # the FK-specialized expansion checks only FK_MAX_RUN
                    # candidates per probe; longer runs invalidate it
                    flag = flag | (stats[1] > FK_MAX_RUN).astype(jnp.int32)
                # NOTE: final_cap overflow is flagged inside trim() (phase
                # B) from the PRE-clamp verified count — checking the
                # returned cnt here would never fire (ADVICE r4 #1)
                return out_d, out_v, cnt, flag

            entry_ab = jax.jit(phase_ab)
            _cache_put(ab_key, entry_ab)
        out_d, out_v, cnt_dev, flag = entry_ab(ld, lv, nl, rd, rv, nr, prep)
        K.spec_record(flag)
        out = _join_out_table(lt, rt, join_type, out_d, out_v, cnt_dev)
        if final_cap is not None:
            out._cap_learned = True  # right-sized: downstream shrink can skip its sync
        return out

    # ---- exact path (first run of this join shape, or post-overflow) ----
    a_key = ("A", prep is not None) + base_key
    entry_a = _cache_get(a_key)
    if entry_a is None:
        entry_a = jax.jit(trace_a)
        _cache_put(a_key, entry_a)
    lo, counts, build_order, total_dev = entry_a(ld, lv, nl, rd, rv, nr, prep)
    # ONE host transfer for (candidate total, max fan-out): total sizes the
    # expansion; fan-out <= 1 (FK/PK joins — nearly every TPC-H join)
    # unlocks the expansion-free phase-B specialization on warm runs
    stats = np.asarray(jax.device_get(total_dev))
    total = int(stats[0])
    fan = int(stats[1])
    expand_cap = round_capacity(max(total, 1))
    if metrics is not None:
        metrics.counter("join_candidates").add(total)

    b_key = ("B", expand_cap, prep is not None) + base_key
    entry_b = _cache_get(b_key)
    if entry_b is None:
        entry_b = jax.jit(
            _make_trace_b(
                lt, rt, on, join_type, filter, lcap, rcap, expand_cap, None
            )
        )
        _cache_put(b_key, entry_b)
    out_d, out_v, cnt_dev, _bflag = entry_b(
        ld, lv, nl, rd, rv, nr, lo, counts, build_order, prep
    )
    # learn the verified output size too (second host sync, cold runs
    # only): warm runs then emit right-sized outputs with zero syncs
    cnt = int(cnt_dev)
    _cache_put(
        ("CAP",) + base_key,
        (
            expand_cap,
            round_capacity(max(cnt, 1)),
            fan <= FK_MAX_RUN and filter is None,
        ),
    )
    out = _join_out_table(lt, rt, join_type, out_d, out_v, cnt)
    tgt = round_capacity(max(cnt, 1))
    if tgt < out.capacity:
        out = out.with_capacity(tgt)
    out._cap_learned = True
    return out


def _join_out_table(lt, rt, join_type, out_d, out_v, cnt) -> Table:
    if join_type in ("semi", "anti"):
        names = list(lt.names)
        src_cols = list(lt.columns)
    else:
        names = list(lt.names) + list(rt.names)
        src_cols = list(lt.columns) + list(rt.columns)
    cols = [
        # join outputs are row-subsets of their inputs: value ranges carry
        Column(c.dtype, d, v, c.dictionary, vrange=c.vrange)
        for c, d, v in zip(src_cols, out_d, out_v)
    ]
    return Table(names, cols, cnt)


def _make_trace_b(lt, rt, on, join_type, filter, lcap, rcap, out_cap, final_cap, fk=False):
    """Phase-B tracer: expand candidates at ``out_cap``, verify, and
    materialize; when ``final_cap`` is given (learned verified size), the
    output buffers are sliced to it in-trace.

    ``fk=True`` (learned fan-out <= 1, flag-guarded): candidate pair r IS
    probe row r with its single run head — the run-expansion merge sorts
    (two ~(probe+build)-sized variadic sorts) vanish entirely.  Nearly
    every TPC-H join is FK-shaped."""
    if fk:
        out_cap = lcap

    def trim(bflag, out_d, out_v, cnt):
        if final_cap is not None:
            # overflow must be computed from the PRE-clamp verified count:
            # the clamped cnt below can never exceed final_cap, so a
            # post-trim check would silently drop rows instead of firing
            # the speculation-window rerun (ADVICE r4 #1)
            bflag = bflag | (cnt > final_cap).astype(jnp.int32)
            if final_cap < out_d[0].shape[0]:
                out_d = tuple(d[:final_cap] for d in out_d)
                out_v = tuple(v[:final_cap] for v in out_v)
            cnt = jnp.minimum(cnt, final_cap)
        return tuple(out_d), tuple(out_v), cnt, bflag

    def phase_b(ld, lv, nl, rd, rv, nr, lo, counts, build_order, prep=None):
            ltv = _view(lt, ld, lv)
            rtv = _view(rt, rd, rv)
            lkeys, rkeys = _join_keys(ltv, rtv, on)
            lord = tuple(K.orderable_key(c.data, c.dtype, c.vrange) for c in lkeys)
            lval = tuple(c.valid for c in lkeys)
            if prep is not None and len(prep) >= 5:
                # prepped build verify keys: re-deriving them here costs
                # O(build) elementwise work per probe morsel (XLA DCE
                # then prunes the dead rkeys evaluation above)
                rord, rval = tuple(prep[3]), tuple(prep[4])
            else:
                rord = tuple(
                    K.orderable_key(c.data, c.dtype, c.vrange) for c in rkeys
                )
                rval = tuple(c.valid for c in rkeys)
            bflag = jnp.int32(0)
            if fk:
                # fan-out <= FK_MAX_RUN (flag-checked): scan each probe's
                # short candidate run in place and keep the first VERIFIED
                # match — no run expansion, no merge sorts.  >1 verified
                # match per probe (genuine duplicate build keys) is exact
                # for semi/anti (any-match) and flags everything else.
                probe_idx = jnp.arange(lcap, dtype=jnp.int32)
                build_idx = jnp.zeros(lcap, jnp.int32)
                nm = jnp.zeros(lcap, jnp.int32)
                for j in range(FK_MAX_RUN):
                    bpos = jnp.clip(
                        lo + j, 0, build_order.shape[0] - 1
                    ).astype(jnp.int32)
                    bidx = build_order[bpos]
                    okj = K.verify_equal(
                        lord, lval, rord, rval, probe_idx, bidx, counts > j
                    )
                    build_idx = jnp.where(okj & (nm == 0), bidx, build_idx)
                    nm = nm + okj.astype(jnp.int32)
                ok = nm > 0
                if join_type not in ("semi", "anti"):
                    bflag = (jnp.max(nm) > 1).astype(jnp.int32)
            else:
                probe_idx, build_idx, pair_alive, _tot = K.join_expand(
                    lo, counts, build_order, out_cap
                )
                ok = K.verify_equal(
                    lord, lval, rord, rval, probe_idx, build_idx, pair_alive
                )
            if filter is not None:
                pair_table = _gather_pair_table(ltv, rtv, probe_idx, build_idx, out_cap)
                fres = filter.evaluate(pair_table)
                ok = ok & fres.data.astype(bool) & fres.valid

            if join_type == "inner":
                # co-sort the (probe, build) index pairs by ~ok (cheap int
                # payloads through the sorting network), then materialize
                # each side with ONE packed row gather (kernels.take_rows:
                # per-column gathers cost ~4x more; this was the dominant
                # term of the q18 6M-row join, bench/PROFILE_SF1.md)
                cnt = jnp.sum(ok)
                _, (pc, bc) = K.cosort((~ok,), (probe_idx, build_idx))
                live = jnp.arange(out_cap) < cnt
                pl_d, pl_v, _ = K.take_rows(ld, lv, pc)
                pr_d, pr_v, _ = K.take_rows(rd, rv, bc)
                out_d = list(pl_d) + list(pr_d)
                out_v = [v & live for v in pl_v] + [v & live for v in pr_v]
                return trim(bflag, tuple(out_d), tuple(out_v), cnt)

            if join_type in ("semi", "anti"):
                # per-probe any-match from the contiguous candidate runs
                # (probe_idx is non-decreasing) — prefix sums, no scatter
                matched = ok if fk else _any_match_per_probe(counts, ok, out_cap)
                l_alive = jnp.arange(lcap) < nl
                keep = (matched if join_type == "semi" else ~matched) & l_alive
                return trim(bflag, *K.filter_compact(ld, lv, keep, nl))

            # left / right / full outer: matched pairs, then the unmatched
            # side(s) padded with nulls, squeezed by ONE compaction co-sort
            cnt = jnp.sum(ok)
            _, (pc, bc) = K.cosort((~ok,), (probe_idx, build_idx))
            pair_live = jnp.arange(out_cap) < cnt
            pl_d, pl_v, _ = K.take_rows(ld, lv, pc)
            pr_d, pr_v, _ = K.take_rows(rd, rv, bc)
            col_d = [[d] for d in pl_d] + [[d] for d in pr_d]
            col_v = [[v & pair_live] for v in pl_v] + [
                [v & pair_live] for v in pr_v
            ]
            nld = len(ld)
            alive_segs = [pair_live]
            if join_type in ("left", "full"):
                match_probe = ok if fk else _any_match_per_probe(counts, ok, out_cap)
                l_alive = jnp.arange(lcap) < nl
                lw = l_alive & ~match_probe
                for i, d in enumerate(ld):
                    col_d[i].append(d)
                    col_v[i].append(lv[i] & lw)
                for j, d in enumerate(rd):
                    col_d[nld + j].append(jnp.zeros(lcap, d.dtype))
                    col_v[nld + j].append(jnp.zeros(lcap, bool))
                alive_segs.append(lw)
            if join_type in ("right", "full"):
                visited = (
                    jnp.zeros(rcap, bool)
                    .at[build_idx.astype(jnp.int32)]
                    .max(ok, mode="drop")
                )
                r_alive = jnp.arange(rcap) < nr
                rw = r_alive & ~visited
                for i, d in enumerate(ld):
                    col_d[i].append(jnp.zeros(rcap, d.dtype))
                    col_v[i].append(jnp.zeros(rcap, bool))
                for j, d in enumerate(rd):
                    col_d[nld + j].append(d)
                    col_v[nld + j].append(rv[j] & rw)
                alive_segs.append(rw)
            alive_all = jnp.concatenate(alive_segs)
            datas_all = tuple(jnp.concatenate(s) for s in col_d)
            valids_all = tuple(jnp.concatenate(s) for s in col_v)
            return trim(bflag, *K.filter_compact(
                datas_all, valids_all, alive_all, jnp.int64(alive_all.shape[0])
            ))

    return phase_b


def _view(base: Table, datas, valids) -> Table:
    cols = [
        Column(c.dtype, d, v, c.dictionary, vrange=c.vrange)
        for c, d, v in zip(base.columns, datas, valids)
    ]
    return Table(list(base.names), cols, 0)


def _any_match_per_probe(counts, ok, out_cap):
    """Per-probe 'any verified candidate' from the contiguous candidate runs
    (probe_idx is non-decreasing) — prefix sums over the pair mask instead
    of a probe-capacity scatter-max (bench/MICRO.md rule 1)."""
    cum = jnp.cumsum(counts)
    starts = cum - counts
    mc = jnp.cumsum(ok.astype(jnp.int32))
    hi = jnp.clip(cum - 1, 0, out_cap - 1)
    lo_prev = jnp.clip(starts - 1, 0, out_cap - 1)
    in_run = mc[hi] - jnp.where(starts > 0, mc[lo_prev], 0)
    return (counts > 0) & (in_run > 0)


def _gather_pair_table(lt: Table, rt: Table, probe_idx, build_idx, out_cap) -> Table:
    ld, lv, _ = K.take_rows(
        tuple(c.data for c in lt.columns), tuple(c.valid for c in lt.columns), probe_idx
    )
    rd, rv, _ = K.take_rows(
        tuple(c.data for c in rt.columns), tuple(c.valid for c in rt.columns), build_idx
    )
    cols = [
        Column(c.dtype, d, v, c.dictionary)
        for c, d, v in zip(lt.columns, ld, lv)
    ] + [
        Column(c.dtype, d, v, c.dictionary)
        for c, d, v in zip(rt.columns, rd, rv)
    ]
    return Table(list(lt.names) + list(rt.names), cols, out_cap)


class CrossJoinExec(ExecutionPlan):
    """Cartesian product (cross_join.rs:52): pure index arithmetic."""

    def __init__(self, left: ExecutionPlan, right: ExecutionPlan):
        super().__init__()
        self.left = left
        self.right = right

    def schema(self) -> Schema:
        return Schema(list(self.left.schema().fields) + list(self.right.schema().fields))

    def children(self):
        return [self.left, self.right]

    def with_new_children(self, c):
        return CrossJoinExec(c[0], c[1])

    def _execute(self) -> Table:
        lt = self.left.execute()
        rt = self.right.execute()
        return cross_join_tables(lt, rt)

    def _display_line(self):
        return "CrossJoinExec"


def cross_join_tables(lt: Table, rt: Table) -> Table:
    # single-row side (scalar-subquery / null-aware-NOT-IN count shapes):
    # broadcast that row across the other side's buffers — no index
    # arithmetic, no host row counts, trace-pure under whole-query fusion
    for flip in (False, True):
        a, b = (lt, rt) if not flip else (rt, lt)
        if isinstance(b._nrows, int) and b._nrows == 1:
            cols, names = [], []
            alive = jnp.arange(a.capacity) < a.nrows_dev
            acols = [
                Column(c.dtype, c.data, c.valid & alive, c.dictionary,
                       vrange=c.vrange)
                for c in a.columns
            ]
            bcols = [
                Column(
                    c.dtype,
                    jnp.broadcast_to(c.data[0], (a.capacity,) + c.data.shape[1:]),
                    jnp.broadcast_to(c.valid[0], (a.capacity,)) & alive,
                    c.dictionary,
                )
                for c in b.columns
            ]
            l_out = acols if not flip else bcols
            r_out = bcols if not flip else acols
            return Table(
                list(lt.names) + list(rt.names), l_out + r_out, a.nrows_dev
            )
    total = lt.nrows * rt.nrows
    out_cap = round_capacity(max(total, 1))
    r = jnp.arange(out_cap)
    nr = max(rt.nrows, 1)
    li = jnp.minimum(r // nr, max(lt.capacity - 1, 0))
    ri = jnp.minimum(r % nr, max(rt.capacity - 1, 0))
    alive = r < total
    cols, names = [], []
    for n, c in zip(lt.names, lt.columns):
        cols.append(Column(c.dtype, c.data[li], c.valid[li] & alive, c.dictionary))
        names.append(n)
    for n, c in zip(rt.names, rt.columns):
        cols.append(Column(c.dtype, c.data[ri], c.valid[ri] & alive, c.dictionary))
        names.append(n)
    return Table(names, cols, total)
