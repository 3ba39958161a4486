"""Regression tests for the round-4 advisor findings (ADVICE.md r4) plus a
stale-data bug found while fixing them:

1. Warm-path learned-capacity overflow must be computed from the PRE-clamp
   verified count (trim used to clamp before the check, so growth past the
   learned final_cap silently dropped rows when candidates stayed within
   expand_cap — e.g. a residual filter that passes more rows than it did
   on the learning run).
2. The vrange-driven int32 narrowing of 64-bit sort/verify keys is a
   trace-time decision; every cross-query program cache (join programs,
   fused-stage cache) must key on it, or a same-signature table whose
   values exceed int32 wraps — wrong sort order, merged groups.
3. Candidate totals must accumulate in int64: counts is int32 and a
   skewed many-to-many join can exceed 2^31 candidate pairs, wrapping the
   sum negative and clearing the overflow flag.
4. The segment-position memo must be per-thread (concurrent queries raced
   on the shared OrderedDict's eviction).
5. (found in r5) The global fused-stage cache must never replay the FIRST
   query's source data: a cached stage executed for a re-registered
   same-signature table has to read the CURRENT table's buffers.
"""

import threading

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.ops import join as J
from datafusion_tpu.ops import kernels as K


@pytest.fixture(autouse=True)
def _force_learned_path(monkeypatch):
    # below SHRINK_SYNC_MIN_CAP the probe-capacity speculation preempts
    # capacity learning; zero it so CI-sized tables take the learned path
    monkeypatch.setattr(J, "SHRINK_SYNC_MIN_CAP", 0)


def _ctx(probe_keys, build_keys, build_y=None):
    if build_y is None:
        build_y = [i * 10 for i in range(len(build_keys))]
    ctx = ExecutionContext()
    ctx.register_table(
        "f",
        Table.from_pydict({"k": probe_keys, "x": list(range(len(probe_keys)))}),
    )
    ctx.register_table("d", Table.from_pydict({"k": build_keys, "y": build_y}))
    return ctx


def test_learned_final_cap_overflow_reruns_exactly():
    # Learning run: residual filter x < y passes NOTHING (y=0), so the
    # learned verified-output capacity is 1 while the candidate capacity
    # is 1024.  Same-signature build side with y=10^6 passes all 600
    # pairs: candidates stay within expand_cap and the ONLY guard is the
    # pre-clamp final_cap check inside trim (ADVICE r4 #1 — the post-trim
    # check could never fire and 599 rows vanished silently).
    sql = "SELECT f.k, x, y FROM f JOIN d ON f.k = d.k AND x < y"
    # 6000 rows: the verified count on the swapped run must exceed the
    # 4096 round_capacity floor for the learned final_cap to be the
    # binding constraint
    probe = [i % 50 for i in range(6000)]
    build = list(range(50))

    ctx = _ctx(probe, build, build_y=[0] * 50)
    for _ in range(3):  # learn caps, then exercise the warm path
        out = ctx.sql(sql).collect().to_pydict()
        assert len(out["k"]) == 0

    ctx2 = _ctx(probe, build, build_y=[1_000_000] * 50)
    got = ctx2.sql(sql).collect().to_pydict()
    assert len(got["k"]) == 6000
    assert sorted(got["k"]) == sorted(probe)


def test_vrange_narrowing_keyed_in_stage_cache():
    # First query: int64 sort key whose recorded range fits int32 -> the
    # fused ORDER BY stage compiles with a narrowed int32 sort key and
    # lands in the global stage cache.  A same-signature table with values
    # past 2^31 must NOT reuse that program: wrapped keys sort negative
    # (ADVICE r4 #2).
    small = [3, 1, 2, 0]
    ctx = ExecutionContext()
    ctx.register_table("u", Table.from_pydict({"k": small}))
    for _ in range(2):
        assert ctx.sql("SELECT k FROM u ORDER BY k").collect().to_pydict() == {
            "k": [0, 1, 2, 3]
        }

    wide = [(1 << 31) + 5, 0, (1 << 33) + 1, 7]
    ctx2 = ExecutionContext()
    ctx2.register_table("u", Table.from_pydict({"k": wide}))
    got = ctx2.sql("SELECT k FROM u ORDER BY k").collect().to_pydict()
    assert got == {"k": [0, 7, (1 << 31) + 5, (1 << 33) + 1]}


def test_wide_int64_join_keys_match_exactly():
    # 64-bit join keys beyond int32 range: hashing/verification must use
    # full-width values (keys that alias under int32 wraparound must not
    # match, and genuinely equal wide keys must).
    sql = "SELECT f.k, x, y FROM f JOIN d ON f.k = d.k"
    big_probe = [(1 << 32) + (i % 50) for i in range(600)]
    small_build = list(range(50))  # alias big_probe under int32 wrap
    assert len(_ctx(big_probe, small_build).sql(sql).collect().to_pydict()["k"]) == 0

    big_build = [(1 << 32) + i for i in range(50)]
    got = _ctx(big_probe, big_build).sql(sql).collect().to_pydict()
    assert len(got["k"]) == 600
    assert sorted(set(got["k"])) == big_build


def test_candidate_stats_accumulates_int64():
    counts = jnp.full(3, 1 << 30, jnp.int32)  # total 3*2^30 > 2^31
    stats = K.candidate_stats(counts)
    assert int(stats[0]) == 3 << 30
    assert int(stats[1]) == 1 << 30


def test_segment_position_memo_is_per_thread():
    assert isinstance(K._SEG_POS_MEMO, threading.local)
    main_memo = K._SEG_POS_MEMO.memo
    seen = {}

    def probe():
        seen["memo"] = K._SEG_POS_MEMO.memo

    t = threading.Thread(target=probe)
    t.start()
    t.join()
    assert seen["memo"] is not main_memo


def test_stage_cache_reads_current_table_data():
    # the fused-stage cache is keyed on (plan shape, dtypes, capacities,
    # dictionaries): two same-shaped NUMERIC tables collide by design and
    # must share the compiled program but NOT the data
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"a": [1, 2, 3, 4]}))
    assert ctx.sql("SELECT sum(a) AS s FROM t").collect().to_pydict() == {"s": [10]}
    ctx.register_table("t", Table.from_pydict({"a": [10, 20, 30, 40]}))
    assert ctx.sql("SELECT sum(a) AS s FROM t").collect().to_pydict() == {"s": [100]}
    ctx2 = ExecutionContext()
    ctx2.register_table("t", Table.from_pydict({"a": [5, 6, 7, 8]}))
    assert ctx2.sql("SELECT sum(a) AS s FROM t").collect().to_pydict() == {"s": [26]}
