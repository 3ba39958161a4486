"""Failure detection / recovery (SURVEY.md §5): scheduler state survives a
restart (etcd/sled-equivalent persistence via FileKV), completed stages
never re-run (durable shuffle files), lost executors requeue tasks, and
NDJSON datasource coverage."""

from __future__ import annotations

import json
import os
import time

import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.distributed import (
    Executor,
    FileKV,
    Scheduler,
    SchedulerState,
    serde,
)
from datafusion_tpu.distributed.exchange import TableStore
from datafusion_tpu.distributed import shuffle_io


def small_table():
    return Table.from_pydict(
        {"k": ["a", "b", "a", "c"] * 5, "v": list(range(20))}
    )


def test_scheduler_state_survives_restart(tmp_path):
    """Job/stage/task state persisted in the KV store outlives the
    scheduler process (scheduler/src/state/mod.rs:150-234 semantics)."""
    work = str(tmp_path / "w")
    t = small_table()

    # scheduler #1: plan a job, run HALF of it, then "crash"
    st1 = SchedulerState(FileKV(f"{work}/_state"), work_dir=work)
    sched1 = Scheduler(st1, work_dir=work, target_partitions=2)
    store = TableStore()
    store.put("t", t)
    sched1.register_table_schema("t", t.schema())
    ctx = ExecutionContext()
    ctx.register_table("t", t)
    plan = ctx.optimize(
        ctx.create_logical_plan("SELECT k, sum(v) AS s FROM t GROUP BY k")
    )
    job = sched1.execute_query(serde.plan_to_dict(plan))

    # run exactly the first stage's tasks through a real executor poll
    ex = Executor("e1", sched1, store)
    sched1.state.register_executor("e1")
    first_stage_tasks = 0
    while True:
        task = sched1.poll_work("e1")
        if task is None or task["stage_id"] != 0:
            break
        ex.run_task(task)
        first_stage_tasks += 1
    assert first_stage_tasks > 0
    del sched1, st1  # "crash"

    # scheduler #2 over the same KV dir: the job resumes where it stopped
    st2 = SchedulerState(FileKV(f"{work}/_state"), work_dir=work)
    sched2 = Scheduler(st2, work_dir=work, target_partitions=2)
    sched2.register_table_schema("t", t.schema())
    assert st2.stage_complete(job, 0)  # completed stage NOT re-run
    # startup recovery: tasks assigned to executors that died with the old
    # scheduler go back to PENDING
    st2.requeue_lost_tasks(window_s=0.0)
    ex2 = Executor("e2", sched2, store)
    st2.register_executor("e2")
    while True:
        task = sched2.poll_work("e2")
        if task is None:
            break
        ex2.run_task(task)
    status = sched2.get_job_status(job)
    assert status["status"] == "COMPLETED"
    out = shuffle_io.concat_read(status["final_paths"], status["final_schema"])
    got = dict(zip(*[out.to_pydict()[n] for n in out.names[:2]]))
    assert got == {"a": 90, "b": 45, "c": 55}


def test_ndjson_datasource(tmp_path):
    p = tmp_path / "t.ndjson"
    with open(p, "w") as f:
        for i in range(10):
            f.write(json.dumps({"a": i, "s": f"v{i % 3}"}) + "\n")
    ctx = ExecutionContext()
    ctx.register_json("t", str(p))
    out = ctx.sql(
        "SELECT s, count(*) AS c FROM t GROUP BY s ORDER BY s"
    ).collect()
    assert out.to_pydict() == {"s": ["v0", "v1", "v2"], "c": [4, 3, 3]}


def test_lost_delivery_requeues_on_next_poll(tmp_path):
    """poll_work marks a task RUNNING before the response reaches the
    executor; if delivery (or the completion report) is lost, the next poll
    from that executor — whose loop is synchronous, so running=[] —
    requeues the stranded task instead of leaving the job hung forever
    (the dead-executor requeue never fires while heartbeats continue)."""
    work = str(tmp_path / "w")
    t = small_table()
    st = SchedulerState(FileKV(f"{work}/_state"), work_dir=work)
    sched = Scheduler(st, work_dir=work, target_partitions=2)
    store = TableStore()
    store.put("t", t)
    sched.register_table_schema("t", t.schema())
    ctx = ExecutionContext()
    ctx.register_table("t", t)
    plan = ctx.optimize(
        ctx.create_logical_plan("SELECT k, sum(v) AS s FROM t GROUP BY k")
    )
    job = sched.execute_query(serde.plan_to_dict(plan))
    st.register_executor("e1")

    # assignment happens ... and the response is "lost" (never executed)
    lost = sched.poll_work("e1")
    assert lost is not None
    tkey = st.task(job, lost["stage_id"], lost["partition"])
    assert tkey["status"] == "RUNNING"

    # within the grace period the executor's empty report does NOT requeue
    assert all(
        st.task(job, lost["stage_id"], p)["status"] != "PENDING"
        or p != lost["partition"]
        for p in [lost["partition"]]
    )
    st.requeue_disowned_tasks("e1", [], grace_s=10.0)
    assert st.task(job, lost["stage_id"], lost["partition"])["status"] == "RUNNING"

    # past the grace period the poll requeues it, and the job completes
    st.requeue_disowned_tasks("e1", [], grace_s=0.0)
    assert st.task(job, lost["stage_id"], lost["partition"])["status"] == "PENDING"

    ex = Executor("e1", sched, store)
    while True:
        task = sched.poll_work("e1", running=[])
        if task is None:
            break
        ex.run_task(task)
    status = sched.get_job_status(job)
    assert status["status"] == "COMPLETED"
    out = shuffle_io.concat_read(status["final_paths"], status["final_schema"])
    got = dict(zip(*[out.to_pydict()[n] for n in out.names[:2]]))
    assert got == {"a": 90, "b": 45, "c": 55}
