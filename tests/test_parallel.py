"""SPMD mesh layer (datafusion_tpu.parallel): sharded tables, distributed
filter/project/aggregate (partial -> all_to_all re-key -> final in ONE
jitted program) and the partitioned hash join, on the 8-virtual-device CPU
mesh — results verified against the single-device engine.

This is the intra-slice ICI path (SURVEY.md §2.8 parallelism mapping); the
stage-DAG layer (tests/test_distributed*.py) is the cross-slice path."""

from __future__ import annotations

import jax
import numpy as np
import pytest

from datafusion_tpu.columnar import Table
from datafusion_tpu.exprs.physical import PhysBinary, PhysCol, PhysLit
from datafusion_tpu.ops.aggregate import HashAggregateExec, PhysAggExpr
from datafusion_tpu.ops.basic import MemoryExec
from datafusion_tpu.parallel.mesh import ShardedTable, make_mesh
from datafusion_tpu.parallel.ops import (
    dist_aggregate,
    dist_filter,
    dist_join,
    dist_project,
)
from datafusion_tpu.types import ScalarValue
from datafusion_tpu.types.dtypes import BOOL, INT64


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual multi-device mesh"
)


def table(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    return Table.from_pydict(
        {
            "k": [f"key{int(i)}" for i in rng.integers(0, 20, n)],
            "v": rng.integers(0, 1000, n).tolist(),
        }
    )


def col(t: Table, name: str) -> PhysCol:
    i = t.names.index(name)
    return PhysCol(name, i, t.columns[i].dtype)


def sorted_rows(t: Table):
    d = t.to_pydict()
    return sorted(zip(*d.values()), key=lambda r: tuple(str(x) for x in r))


@needs_devices
def test_shard_roundtrip():
    t = table(257)
    mesh = make_mesh(8)
    st = ShardedTable.from_table(t, mesh)
    assert st.total_rows() == 257
    back = st.to_table()
    assert sorted_rows(back) == sorted_rows(t)


@needs_devices
def test_dist_filter_project():
    t = table(500)
    mesh = make_mesh(8)
    st = ShardedTable.from_table(t, mesh)
    pred = PhysBinary(col(t, "v"), ">", PhysLit(ScalarValue.int64(500)), BOOL)
    filtered = dist_filter(st, pred)
    proj = dist_project(
        filtered,
        [(col(t, "k"), "k"), (PhysBinary(col(t, "v"), "*", PhysLit(ScalarValue.int64(2)), INT64), "v2")],
    )
    got = sorted_rows(proj.to_table())
    d = t.to_pydict()
    want = sorted(
        ((k, v * 2) for k, v in zip(d["k"], d["v"]) if v > 500),
        key=lambda r: tuple(str(x) for x in r),
    )
    assert got == want


@needs_devices
def test_dist_aggregate_matches_single_device():
    t = table(800)
    mesh = make_mesh(8)
    st = ShardedTable.from_table(t, mesh)
    group = [(col(t, "k"), "k")]
    aggs = [
        PhysAggExpr("sum", col(t, "v"), "s"),
        PhysAggExpr("count", None, "c"),
        PhysAggExpr("min", col(t, "v"), "mn"),
        PhysAggExpr("avg", col(t, "v"), "a"),
    ]
    out = dist_aggregate(st, group, aggs).to_table()

    single = HashAggregateExec(
        "single", group, aggs, MemoryExec(t, t.schema())
    ).execute()
    assert sorted_rows(out) == sorted_rows(single)


@needs_devices
def test_dist_aggregate_no_group():
    t = table(300)
    mesh = make_mesh(8)
    st = ShardedTable.from_table(t, mesh)
    out = dist_aggregate(st, [], [PhysAggExpr("sum", col(t, "v"), "s")]).to_table()
    assert out.to_pydict()["s"] == [sum(t.to_pydict()["v"])]


@needs_devices
def test_dist_join_skewed_fanout_retry():
    """A hot key with large fanout overflows the initial capacity estimate
    and triggers the host-level fanout retry (SURVEY §7 hard part (f))."""
    n = 256
    lt = Table.from_pydict({"k": ["hot"] * n, "x": list(range(n))})
    rt = Table.from_pydict({"k": ["hot"] * 16, "y": list(range(16))})
    mesh = make_mesh(4)
    sl = ShardedTable.from_table(lt, mesh)
    sr = ShardedTable.from_table(rt, mesh)
    out = dist_join(sl, sr, [(col(lt, "k"), col(rt, "k"))], "inner")
    assert out.total_rows() == n * 16


@needs_devices
def test_dist_join_matches_single_device():
    lt = table(400, seed=1)
    rt = Table.from_pydict(
        {"k": [f"key{i}" for i in range(20)], "w": [i * 100 for i in range(20)]}
    )
    mesh = make_mesh(8)
    sl = ShardedTable.from_table(lt, mesh)
    sr = ShardedTable.from_table(rt, mesh)
    on = [(col(lt, "k"), col(rt, "k"))]
    out = dist_join(sl, sr, on, "inner").to_table()

    from datafusion_tpu.ops.join import join_tables

    want = join_tables(lt, rt, on, "inner", None)
    assert sorted_rows(out) == sorted_rows(want)


@needs_devices
def test_dist_sort_total_order():
    """Range-partitioned distributed ORDER BY: reading shards in order must
    equal the single-device sort (the reference coalesces to 1 partition;
    this is the TeraSort-style improvement)."""
    from datafusion_tpu.ops.sort import PhysSortExpr, sort_table
    from datafusion_tpu.parallel.ops import dist_sort

    t = table(n=2000, seed=3)
    mesh = make_mesh()
    st = ShardedTable.from_table(t, mesh)
    specs = [PhysSortExpr(col(t, "v"), ascending=False), PhysSortExpr(col(t, "k"))]
    st2, overflow = dist_sort(st, specs, bucket_cap=st.shard_cap * 2)
    assert overflow == 0
    got = st2.to_table().to_pandas()
    exp = sort_table(t, specs)
    exp = exp.to_pandas().head(len(got))
    assert got["v"].tolist() == exp["v"].tolist()
    assert got["k"].tolist() == exp["k"].tolist()


@needs_devices
def test_dist_sort_with_nulls():
    from datafusion_tpu.ops.sort import PhysSortExpr, sort_table
    from datafusion_tpu.parallel.ops import dist_sort

    rng = np.random.default_rng(9)
    vals = [int(v) if v % 5 else None for v in rng.integers(0, 50, 700)]
    t = Table.from_pydict({"v": vals})
    mesh = make_mesh()
    st = ShardedTable.from_table(t, mesh)
    specs = [PhysSortExpr(col(t, "v"), ascending=True, nulls_first=False)]
    st2, overflow = dist_sort(st, specs, bucket_cap=st.shard_cap * 4)
    assert overflow == 0
    import pandas as pd

    got = st2.to_table().to_pandas()["v"]
    exp = sort_table(t, specs).to_pandas()["v"]
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


@needs_devices
@pytest.mark.parametrize("jt", ["inner", "left", "right", "full", "semi", "anti"])
def test_dist_join_all_types_match_single_device(jt):
    """All six join types partitioned on the mesh (reference
    hash_join.rs:139-144): hash partitioning co-locates every key, so the
    per-shard six-type join composes to the global join."""
    rng = np.random.default_rng(7)
    n = 300
    lt = Table.from_pydict(
        {
            "k": [f"key{int(i)}" if i % 7 else None for i in rng.integers(0, 25, n)],
            "v": rng.integers(0, 100, n).tolist(),
        }
    )
    rt = Table.from_pydict(
        {
            "k2": [f"key{i}" for i in range(0, 40, 2)] + [None],
            "w": [i * 10 for i in range(21)],
        }
    )
    mesh = make_mesh(8)
    sl = ShardedTable.from_table(lt, mesh)
    sr = ShardedTable.from_table(rt, mesh)
    on = [(col(lt, "k"), col(rt, "k2"))]
    out = dist_join(sl, sr, on, jt).to_table()

    from datafusion_tpu.ops.join import join_tables

    want = join_tables(lt, rt, on, jt, None)
    assert sorted_rows(out) == sorted_rows(want)


@needs_devices
def test_dist_join_residual_filter():
    lt = table(200, seed=5)
    rt = Table.from_pydict(
        {"k2": [f"key{i}" for i in range(20)], "w": [i * 100 for i in range(20)]}
    )
    mesh = make_mesh(8)
    sl = ShardedTable.from_table(lt, mesh)
    sr = ShardedTable.from_table(rt, mesh)
    on = [(col(lt, "k"), col(rt, "k2"))]
    # residual: v < w  (combined schema is [k, v, k2, w])
    resid = PhysBinary(
        PhysCol("v", 1, lt.columns[1].dtype), "<", PhysCol("w", 3, rt.columns[1].dtype), BOOL
    )
    out = dist_join(sl, sr, on, "inner", filter=resid).to_table()

    from datafusion_tpu.ops.join import join_tables

    want = join_tables(lt, rt, on, "inner", resid)
    assert sorted_rows(out) == sorted_rows(want)


@needs_devices
@pytest.mark.parametrize("jt", ["inner", "left", "right", "full", "semi", "anti"])
def test_dist_join_skew_aware(jt):
    """90%-hot-key join with skew=True: the in-program histogram marks the
    hot bucket, hot probe rows stay local while their build rows replicate
    via all_gather (SURVEY §7 hard part (f)) — results match the
    single-device join, per-shard loads stay balanced, zero retries."""
    rng = np.random.default_rng(3)
    n = 2000
    keys = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 50, n))
    lt = Table.from_pydict(
        {
            "k": [f"key{int(k)}" for k in keys],
            "v": rng.integers(0, 100, n).tolist(),
        }
    )
    rt = Table.from_pydict(
        {
            "k2": [f"key{i}" for i in range(60)],
            "w": [i * 10 for i in range(60)],
        }
    )
    mesh = make_mesh(8)
    sl = ShardedTable.from_table(lt, mesh)
    sr = ShardedTable.from_table(rt, mesh)
    on = [(col(lt, "k"), col(rt, "k2"))]
    out_sh = dist_join(sl, sr, on, jt, skew=True)
    out = out_sh.to_table()

    from datafusion_tpu.ops.join import join_tables

    want = join_tables(lt, rt, on, jt, None)
    assert sorted_rows(out) == sorted_rows(want)
    if jt == "inner":
        # hot probe rows never moved: output stays balanced across shards
        counts = np.asarray(out_sh.nrows).astype(float)
        assert counts.max() <= 2.0 * counts.sum() / len(counts)


@pytest.mark.parametrize(
    "q",
    [
        "SELECT g, i, row_number() OVER (PARTITION BY g ORDER BY v) AS rn "
        "FROM t ORDER BY g, i",
        "SELECT g, i, rank() OVER (PARTITION BY g ORDER BY v DESC) AS rk, "
        "sum(v) OVER (PARTITION BY g ORDER BY v) AS rs FROM t ORDER BY g, i",
        "SELECT g, i, lag(s, 1) OVER (PARTITION BY g ORDER BY i) AS lg, "
        "nth_value(s, 2) OVER (PARTITION BY g ORDER BY i) AS nv "
        "FROM t ORDER BY g, i",
        "SELECT g, i, avg(v) OVER (PARTITION BY g ORDER BY i "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma FROM t ORDER BY g, i",
        # no PARTITION BY: needs a total order -> executor falls back
        "SELECT i, row_number() OVER (ORDER BY v) AS rn FROM t ORDER BY i",
    ],
)
def test_dist_window_matches_local(q):
    """Window functions on the mesh: partition-hash all_to_all placement +
    per-shard traced window (dist_window) must be row-exact vs the
    single-device engine (reference windows/window_agg_exec.rs:42 evaluates
    per lexicographic partition range — same partition-granular contract)."""
    from datafusion_tpu import ExecutionContext

    ctx = ExecutionContext()
    n = 300
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "g": [f"p{i % 11}" for i in range(n)],
                "v": [float((i * 7) % 97) for i in range(n)],
                "s": [f"s{i % 5}" for i in range(n)],
                "i": list(range(n)),
            }
        ),
    )
    local = ctx.sql(q).collect().to_pydict()
    spmd = ctx.sql(q).collect(mesh=make_mesh(8)).to_pydict()
    assert local == spmd


def test_dist_limit_offset_matches_local():
    """LIMIT/OFFSET on the mesh: per-shard prefix-count truncation
    (dist_limit moves no data; dist_skip one co-sort) must reproduce the
    single-device rows exactly — gather order is shard order, so shard
    prefixes ARE the global prefix (limit.rs:44 / fork skip.rs:41)."""
    from datafusion_tpu import ExecutionContext

    ctx = ExecutionContext()
    n = 500
    ctx.register_table(
        "t",
        Table.from_pydict(
            {"k": list(range(n)), "v": [float((i * 13) % 91) for i in range(n)]}
        ),
    )
    mesh = make_mesh(8)
    for q in [
        "SELECT k FROM t ORDER BY v, k LIMIT 17",
        "SELECT k FROM t ORDER BY v, k LIMIT 17 OFFSET 40",
        "SELECT k FROM t WHERE v > 50 LIMIT 23",
        "SELECT k FROM t LIMIT 9999",
        "SELECT k, v FROM t ORDER BY v DESC, k OFFSET 495",
    ]:
        assert (
            ctx.sql(q).collect().to_pydict()
            == ctx.sql(q).collect(mesh=mesh).to_pydict()
        ), q


def test_dist_distinct_aggregate_matches_local():
    """DISTINCT aggregates on the mesh: group-hash PLACEMENT of raw rows
    (each group whole on one shard) + exact per-shard aggregate — the
    set-state semantics of distinct_expressions.rs without shipping sets."""
    from datafusion_tpu import ExecutionContext

    ctx = ExecutionContext()
    n = 400
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "g": [f"p{i % 7}" for i in range(n)],
                "x": [i % 13 for i in range(n)],
                "s": [f"s{i % 23}" for i in range(n)],
            }
        ),
    )
    mesh = make_mesh(8)
    for q in [
        "SELECT g, count(DISTINCT x) AS cd, sum(x) AS sx FROM t GROUP BY g ORDER BY g",
        "SELECT g, count(DISTINCT s) AS cs, count(*) AS c FROM t GROUP BY g ORDER BY g",
        "SELECT g, approx_distinct(x) AS ad FROM t GROUP BY g ORDER BY g",
        "SELECT count(DISTINCT x) AS cd FROM t",
    ]:
        assert (
            ctx.sql(q).collect().to_pydict()
            == ctx.sql(q).collect(mesh=mesh).to_pydict()
        ), q


@needs_devices
def test_dist_global_distinct_mesh_native():
    """DISTINCT aggregates WITHOUT group keys run mesh-native: rows
    all_to_all by the hash of the DISTINCT argument (each value's copies
    land on ONE shard, so the local dedup is a global dedup), partial
    states merge via the all_gather path.  Previously this always gathered
    the full table to one device (the CoalescePartitions analogue)."""
    from datafusion_tpu import ExecutionContext
    from datafusion_tpu.parallel.executor import SpmdExecutor

    ctx = ExecutionContext()
    n = 2000
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "x": [None if i % 17 == 0 else (i * 7) % 113 for i in range(n)],
                "y": [float(i % 29) for i in range(n)],
                "s": [f"s{(i * 3) % 41}" for i in range(n)],
            }
        ),
    )
    mesh = make_mesh(8)
    for q, expect_mesh in [
        ("SELECT count(DISTINCT x) AS cd FROM t", True),
        ("SELECT sum(DISTINCT x) AS sd, count(DISTINCT x) AS cd, "
         "avg(DISTINCT x) AS ad FROM t", True),
        # non-distinct aggregates ride the same placement (each row lands
        # exactly once, so their partials stay exact)
        ("SELECT count(DISTINCT s) AS cs, sum(y) AS sy, count(*) AS c "
         "FROM t", True),
        ("SELECT min(DISTINCT x) AS mn, max(x) AS mx FROM t", True),
        # mixed DISTINCT arguments: no single placement -> structural gather
        ("SELECT count(DISTINCT x) AS cx, count(DISTINCT s) AS cs FROM t",
         False),
    ]:
        phys = ctx.create_physical_plan_for_mesh(ctx.create_logical_plan(q))
        ex = SpmdExecutor(mesh, strict=expect_mesh)
        got = ex.execute_plan(phys).to_pydict()
        agg_modes = [
            m for op, m in ex.node_modes if op == "HashAggregateExec"
        ]
        if expect_mesh:
            assert agg_modes and all(m == "mesh" for m in agg_modes), (
                q, ex.node_modes,
            )
        else:
            assert "gather" in agg_modes, (q, ex.node_modes)
        assert got == ctx.sql(q).collect().to_pydict(), q


@needs_devices
def test_dist_window_global_order_mesh_native():
    """Windows WITHOUT PARTITION BY run mesh-native: range partition by
    the ORDER BY (ties co-locate) + local evaluation + O(ndev) collective
    corrections (rank offsets, running-aggregate prefixes, lag/lead edge
    halos, head broadcasts).  The reference pins these to a single
    partition; we distribute them.  Golden vs the single-device engine."""
    from datafusion_tpu import ExecutionContext
    from datafusion_tpu.parallel.executor import SpmdExecutor

    ctx = ExecutionContext()
    n = 700
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                # dense duplicate keys so peer groups are real and some
                # straddle would-be shard boundaries without co-location
                "k": [(i * 7) % 40 for i in range(n)],
                "v": [None if i % 13 == 0 else float((i * 11) % 97)
                      for i in range(n)],
                "i": list(range(n)),
            }
        ),
    )
    mesh = make_mesh(8)
    queries = [
        # ranking family over duplicate keys
        "SELECT i, row_number() OVER (ORDER BY k, i) AS rn, "
        "rank() OVER (ORDER BY k) AS r, dense_rank() OVER (ORDER BY k) AS dr, "
        "percent_rank() OVER (ORDER BY k) AS pr, "
        "cume_dist() OVER (ORDER BY k) AS cd, "
        "ntile(7) OVER (ORDER BY k, i) AS nt FROM t",
        # running aggregates (default RANGE frame incl. peers) + nulls
        "SELECT i, sum(v) OVER (ORDER BY k) AS sv, "
        "count(v) OVER (ORDER BY k) AS cv, avg(v) OVER (ORDER BY k) AS av, "
        "min(v) OVER (ORDER BY k) AS mv, max(v) OVER (ORDER BY k) AS xv "
        "FROM t",
        # value functions: cross-shard lag/lead halos, global head/nth
        "SELECT i, lag(v) OVER (ORDER BY k, i) AS l1, "
        "lead(v, 3) OVER (ORDER BY k, i) AS l3, "
        "lag(v, 17) OVER (ORDER BY k, i) AS l17, "
        "first_value(v) OVER (ORDER BY k, i) AS fv, "
        "last_value(v) OVER (ORDER BY k, i) AS lv, "
        "nth_value(v, 5) OVER (ORDER BY k, i) AS nv FROM t",
        # no ORDER BY at all: whole-table aggregates, zero movement
        "SELECT i, sum(v) OVER () AS sv, count(v) OVER () AS cv, "
        "max(v) OVER () AS xv FROM t",
        # descending + nulls-affecting order
        "SELECT i, row_number() OVER (ORDER BY v DESC, i) AS rn, "
        "rank() OVER (ORDER BY v DESC) AS r FROM t",
    ]
    for q in queries:
        phys = ctx.create_physical_plan_for_mesh(ctx.create_logical_plan(q))
        ex = SpmdExecutor(mesh, strict=True)
        got = ex.execute_plan(phys).to_pydict()
        assert any(
            op == "WindowAggExec" and m == "mesh" for op, m in ex.node_modes
        ), (q, ex.node_modes)
        want = ctx.sql(q).collect().to_pydict()
        key = lambda d: sorted(zip(*d.values()), key=repr)
        assert key(got) == key(want), q

    # explicit ROWS frames run mesh-native too (round 4): bounded offsets
    # cross shard edges via static halos; running frames add the
    # preceding-shard totals.  (The reference pins ALL of these to one
    # partition.)
    frame_queries = [
        # bounded both sides, straddling shard boundaries + nulls
        "SELECT i, sum(v) OVER (ORDER BY k, i ROWS BETWEEN 2 PRECEDING "
        "AND CURRENT ROW) AS sv, "
        "count(v) OVER (ORDER BY k, i ROWS BETWEEN 2 PRECEDING AND "
        "CURRENT ROW) AS cv FROM t",
        "SELECT i, avg(v) OVER (ORDER BY k, i ROWS BETWEEN 3 PRECEDING "
        "AND 5 FOLLOWING) AS av, "
        "min(v) OVER (ORDER BY k, i ROWS BETWEEN 3 PRECEDING AND "
        "5 FOLLOWING) AS mv, "
        "max(v) OVER (ORDER BY k, i ROWS BETWEEN 1 FOLLOWING AND "
        "90 FOLLOWING) AS xv FROM t",
        # running frame by ROWS (current-row end, not peer end)
        "SELECT i, sum(v) OVER (ORDER BY k, i ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS rv, "
        "max(v) OVER (ORDER BY k, i ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND 2 FOLLOWING) AS xv FROM t",
    ]
    key = lambda d: sorted(zip(*d.values()), key=repr)
    for q in frame_queries:
        phys = ctx.create_physical_plan_for_mesh(ctx.create_logical_plan(q))
        ex = SpmdExecutor(mesh, strict=True)
        got = ex.execute_plan(phys).to_pydict()
        assert any(
            op == "WindowAggExec" and m == "mesh" for op, m in ex.node_modes
        ), (q, ex.node_modes)
        assert key(got) == key(ctx.sql(q).collect().to_pydict()), q

    # RANGE frames with numeric offsets run mesh-native too (round 5):
    # per-row bisect over the halo-extended ORDER BY key plane; value
    # windows wider than the halo (or null keys) flag and gather
    range_queries = [
        "SELECT i, sum(v) OVER (ORDER BY i RANGE BETWEEN 2 PRECEDING "
        "AND CURRENT ROW) AS sv FROM t",
        "SELECT i, sum(v) OVER (ORDER BY i RANGE BETWEEN 3 PRECEDING "
        "AND 4 FOLLOWING) AS sv, "
        "count(v) OVER (ORDER BY i RANGE BETWEEN 3 PRECEDING AND "
        "4 FOLLOWING) AS cv, "
        "min(v) OVER (ORDER BY i RANGE BETWEEN 3 PRECEDING AND "
        "4 FOLLOWING) AS mv FROM t",
        "SELECT i, avg(v) OVER (ORDER BY i RANGE BETWEEN UNBOUNDED "
        "PRECEDING AND 5 FOLLOWING) AS av, "
        "max(v) OVER (ORDER BY i RANGE BETWEEN CURRENT ROW AND "
        "2 FOLLOWING) AS xv FROM t",
    ]
    for q in range_queries:
        phys = ctx.create_physical_plan_for_mesh(ctx.create_logical_plan(q))
        ex = SpmdExecutor(mesh, strict=True)
        got = ex.execute_plan(phys).to_pydict()
        assert any(
            op == "WindowAggExec" and m == "mesh" for op, m in ex.node_modes
        ), (q, ex.node_modes)
        assert key(got) == key(ctx.sql(q).collect().to_pydict()), q

    # a value window wider than the halo coverage falls back to the
    # gather — flagged at run time, never silently truncated
    q = ("SELECT i, sum(v) OVER (ORDER BY i RANGE BETWEEN 1000 PRECEDING "
         "AND 1000 FOLLOWING) AS sv FROM t")
    phys = ctx.create_physical_plan_for_mesh(ctx.create_logical_plan(q))
    ex = SpmdExecutor(mesh)
    got = ex.execute_plan(phys).to_pydict()
    assert key(got) == key(ctx.sql(q).collect().to_pydict())

    # null ORDER BY keys (v has nulls): flagged, gathered, still correct
    q = ("SELECT i, sum(i) OVER (ORDER BY v RANGE BETWEEN 5 PRECEDING "
         "AND CURRENT ROW) AS sv FROM t")
    phys = ctx.create_physical_plan_for_mesh(ctx.create_logical_plan(q))
    ex = SpmdExecutor(mesh)
    got = ex.execute_plan(phys).to_pydict()
    assert key(got) == key(ctx.sql(q).collect().to_pydict())


def test_dist_sort_sql_nulls_desc_strings():
    """Mesh ORDER BY through the fused exchange+sort path: multi-key with
    NULLS FIRST/LAST, DESC, and dictionary strings must match local."""
    from datafusion_tpu import ExecutionContext

    ctx = ExecutionContext()
    n = 400
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "v": [None if i % 7 == 0 else float((i * 13) % 83) for i in range(n)],
                "s": [None if i % 11 == 0 else f"s{(i * 5) % 19:02d}" for i in range(n)],
                "i": list(range(n)),
            }
        ),
    )
    mesh = make_mesh(8)
    for q in [
        "SELECT i, v, s FROM t ORDER BY v DESC NULLS FIRST, s ASC NULLS LAST, i",
        "SELECT i, v FROM t ORDER BY s DESC, v, i LIMIT 50",
        "SELECT i FROM t ORDER BY v NULLS FIRST, i DESC",
    ]:
        assert (
            ctx.sql(q).collect().to_pydict()
            == ctx.sql(q).collect(mesh=mesh).to_pydict()
        ), q


@pytest.mark.parametrize("jt", ["inner", "left", "right", "full", "semi", "anti"])
def test_dist_join_broadcast(jt):
    """CollectLeft mode on the mesh (hash_join.rs:285): the whole build side
    replicates via all_gather (deterministic identical layout per shard),
    probes stay local — unmatched-build rows detected with a pmax'd visited
    mask and emitted exactly once (shard 0)."""
    from datafusion_tpu.exprs.physical import PhysCol
    from datafusion_tpu.ops.join import join_tables
    from datafusion_tpu.parallel.ops import dist_join
    from datafusion_tpu.types.dtypes import INT64

    rng = np.random.default_rng(4)
    n, m = 3000, 50
    lt = Table.from_pydict(
        {
            "k": rng.integers(0, 30, n).astype(np.int64),
            "v": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    rt = Table.from_pydict(
        {
            "k2": (np.arange(m) * 2).astype(np.int64),  # half unmatched
            "w": rng.integers(0, 100, m).astype(np.int64),
        }
    )
    mesh = make_mesh(8)
    on = [(PhysCol("k", 0, INT64), PhysCol("k2", 0, INT64))]
    out = dist_join(
        ShardedTable.from_table(lt, mesh),
        ShardedTable.from_table(rt, mesh),
        on, jt, broadcast=True,
    ).to_table()
    want = join_tables(lt, rt, on, jt, None)
    assert sorted_rows(out) == sorted_rows(want)


@needs_devices
def test_join_skew_auto_selected_end_to_end(monkeypatch):
    """90%-hot-key join through ctx.sql(...).collect(mesh=...) with NO
    opt-in kwarg: the partitioned join's scalable exchange buckets
    (default_bucket ~ 2*shard_cap/ndev) overflow on the hot key, and
    dist_join escalates to the skew-aware hybrid from the observed
    deficit — the statistics-driven join-mode selection of
    planner.rs:753-851, derived from the data itself.  Result must match
    the single-device engine and output shards must stay balanced."""
    from datafusion_tpu import ExecutionContext
    from datafusion_tpu.parallel.executor import SpmdExecutor

    # build side too big for broadcast mode at this threshold
    monkeypatch.setenv("DFTPU_BCAST_ROWS", "1")

    rng = np.random.default_rng(7)
    n = 140_000  # shard_cap 16384 > the 4096 capacity floor, so the
    # scalable default bucket (2*shard_cap/ndev = 4096+) is actually
    # smaller than shard_cap and hot keys really overflow it
    keys = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 64, n)).astype(
        np.int64
    )
    probe = Table.from_pydict(
        {"k": keys, "v": rng.integers(0, 1000, n).astype(np.int64)}
    )
    build = Table.from_pydict(
        {
            "k2": np.arange(64, dtype=np.int64),
            "w": (np.arange(64, dtype=np.int64) * 10),
        }
    )
    ctx = ExecutionContext()
    ctx.register_table("probe", probe)
    ctx.register_table("build", build)
    sql = "SELECT k, v, w FROM probe JOIN build ON k = k2"

    mesh = make_mesh(8)
    phys = ctx.create_physical_plan_for_mesh(ctx.create_logical_plan(sql))
    ex = SpmdExecutor(mesh, strict=True)
    out_sh = ex.execute_sharded(phys)
    assert ex.fallback_count == 0
    assert any(m == "mesh" for op, m in ex.node_modes if "Join" in op)

    # balanced: no shard holds more than 2x its fair share of the output
    counts = np.asarray(out_sh.nrows).astype(float)
    assert counts.max() <= 2.0 * counts.sum() / len(counts)

    got = out_sh.to_table().to_pydict()
    want = ctx.sql(sql).collect().to_pydict()
    assert sorted(zip(*got.values())) == sorted(zip(*want.values()))


@needs_devices
def test_mesh_explain_analyze_reports_exchange_metrics():
    """EXPLAIN ANALYZE over a mesh surfaces per-node lowering mode and
    exchange statistics (bucket sizes, receive capacities, bytes, retries,
    fallback counts) — the distributed-metrics analogue of the reference's
    repartition.rs:58-100 metrics shipped in task status."""
    from datafusion_tpu import ExecutionContext

    ctx = ExecutionContext()
    ctx.register_table("t", table(800))
    out = ctx.sql(
        "EXPLAIN ANALYZE SELECT k, sum(v) AS s FROM t GROUP BY k ORDER BY k"
    ).collect(mesh=make_mesh(8))
    d = out.to_pydict()
    rows = dict(zip(d["plan_type"], d["plan"]))
    assert "mesh_metrics" in rows and "mesh_plan" in rows
    assert "error_fallbacks: 0" in rows["mesh_metrics"]
    mp = rows["mesh_plan"]
    assert "HashAggregateExec [mesh]" in mp
    assert "SortExec [mesh]" in mp
    assert "bucket_cap=" in mp and "exchange_bytes=" in mp
    assert "output_rows=" in mp and "shard_balance=" in mp


@needs_devices
def test_dist_union_shard_wise(monkeypatch):
    """UNION [ALL] lowers shard-wise (each shard concatenates its own
    segments; union.rs:34 concatenates partition lists) — no gather, with
    string-dictionary merging across inputs, golden vs single device."""
    from datafusion_tpu import ExecutionContext
    from datafusion_tpu.parallel.executor import SpmdExecutor

    ctx = ExecutionContext()
    ctx.register_table(
        "a", Table.from_pydict({"k": ["x", "y", None], "v": [1, 2, 3]})
    )
    ctx.register_table(
        "b", Table.from_pydict({"k": ["y", "z"], "v": [20, 30]})
    )
    mesh = make_mesh(8)
    for sql in (
        "SELECT k, v FROM a UNION ALL SELECT k, v FROM b",
        "SELECT k, v FROM a UNION SELECT k, v FROM b",
    ):
        phys = ctx.create_physical_plan_for_mesh(ctx.create_logical_plan(sql))
        ex = SpmdExecutor(mesh, strict=True)
        got = ex.execute_plan(phys).to_pydict()
        assert any(
            op == "UnionExec" and m == "mesh" for op, m in ex.node_modes
        ), ex.node_modes
        want = ctx.sql(sql).collect().to_pydict()
        key = lambda rows: sorted(zip(*rows.values()), key=repr)
        assert key(got) == key(want), sql
