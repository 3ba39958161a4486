"""Multi-process distributed execution over the JSON/TCP control plane:
a real scheduler process + two executor processes sharing a work dir,
mirroring the reference's dockerized cluster smoke test
(dev/integration-tests.sh) without docker."""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time

import pytest

from datafusion_tpu.columnar import Table
from datafusion_tpu.distributed import serde
from datafusion_tpu.distributed.exchange import TableStore
from datafusion_tpu.distributed.rpc import RpcSchedulerClient
from datafusion_tpu.distributed import shuffle_io


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture()
def cluster(tmp_path):
    """scheduler + 2 executors as real subprocesses on a shared dir."""
    work = str(tmp_path / "cluster")
    os.makedirs(work, exist_ok=True)
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # subprocess output goes to FILES, not pipes: XLA's per-cache-load
    # warnings can exceed the 64KB pipe buffer, and an undrained pipe
    # wedges the writer mid-task (observed: executor blocked in
    # anon_pipe_write with its task stuck RUNNING forever)
    logs = [open(str(tmp_path / f"proc{i}.log"), "wb") for i in range(3)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "datafusion_tpu.distributed.rpc", "scheduler",
             "--port", str(port), "--work-dir", work, "--partitions", "2"],
            env=env, stdout=logs[0], stderr=subprocess.STDOUT,
        )
    ]
    # wait for the scheduler socket
    client = None
    for _ in range(100):
        try:
            client = RpcSchedulerClient(f"127.0.0.1:{port}")
            assert client.call("ping") == "pong"
            break
        except Exception:
            time.sleep(0.1)
    assert client is not None, "scheduler did not come up"
    for i in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "datafusion_tpu.distributed.rpc", "executor",
                 "--scheduler", f"127.0.0.1:{port}", "--work-dir", work,
                 "--id", f"exec-{i}"],
                env=env, stdout=logs[1 + i], stderr=subprocess.STDOUT,
            )
        )
    yield client, work, procs
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=10)
        except subprocess.TimeoutExpired:
            p.kill()
    for f in logs:
        f.close()


def test_multiprocess_cluster_query(cluster):
    client, work, procs = cluster
    # client-side table registration: spill data where executors load it
    # (BallistaContext registers tables client-side, context.rs:97)
    t = Table.from_pydict(
        {
            "k": ["a", "b", "a", "c", "b", "a", "c", "c", "a", "b"],
            "v": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
        }
    )
    store = TableStore(spill_dir=f"{work}/_tables")
    store.put("t", t)
    client.register_table_schema("t", t.schema())

    # plan locally, ship the serialized logical plan
    from datafusion_tpu import ExecutionContext

    ctx = ExecutionContext()
    ctx.register_table("t", t)
    plan = ctx.optimize(
        ctx.create_logical_plan(
            "SELECT k, sum(v) AS s, count(*) AS c FROM t GROUP BY k ORDER BY k"
        )
    )
    job = client.execute_query(serde.plan_to_dict(plan))

    deadline = time.time() + 1200  # subprocess jax import + XLA compiles; generous for oversubscribed CI machines
    status = None
    while time.time() < deadline:
        status = client.get_job_status(job)
        if status["status"] in ("COMPLETED", "FAILED"):
            break
        time.sleep(0.2)
    assert status is not None and status["status"] == "COMPLETED", status

    out = shuffle_io.concat_read(status["final_paths"], status["final_schema"])
    got = out.to_pydict()
    assert got[out.names[0]] == ["a", "b", "c"]
    assert got[out.names[1]] == [19, 17, 19]
    assert got[out.names[2]] == [4, 3, 3]


@pytest.fixture()
def mesh_cluster(tmp_path):
    """scheduler + 2 executor subprocesses, each driving a 4-device mesh
    slice (of its 8 virtual CPU devices) — the multi-host shape of SURVEY
    §2.8: spill-file exchange ACROSS executors, ICI collectives INSIDE
    each executor's slice."""
    work = str(tmp_path / "cluster")
    os.makedirs(work, exist_ok=True)
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    logs = [open(str(tmp_path / f"proc{i}.log"), "wb") for i in range(3)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "datafusion_tpu.distributed.rpc", "scheduler",
             "--port", str(port), "--work-dir", work, "--partitions", "2"],
            env=env, stdout=logs[0], stderr=subprocess.STDOUT,
        )
    ]
    client = None
    for _ in range(100):
        try:
            client = RpcSchedulerClient(f"127.0.0.1:{port}")
            assert client.call("ping") == "pong"
            break
        except Exception:
            time.sleep(0.1)
    assert client is not None, "scheduler did not come up"
    for i in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "datafusion_tpu.distributed.rpc", "executor",
                 "--scheduler", f"127.0.0.1:{port}", "--work-dir", work,
                 "--id", f"exec-{i}", "--mesh-devices", "4"],
                env=env, stdout=logs[1 + i], stderr=subprocess.STDOUT,
            )
        )
    yield client, work, procs
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=10)
        except subprocess.TimeoutExpired:
            p.kill()
    for f in logs:
        f.close()


def test_multiprocess_mesh_slice_tpch(mesh_cluster):
    """TPC-H q3 through a real multi-process cluster whose executors each
    run their stages SPMD over a >1-device mesh; rows must equal the local
    single-device engine's (VERDICT r1 next-step #4)."""
    client, work, procs = mesh_cluster
    from bench.tpch import get_query_sql, load_engine_tables
    from bench.tpch_datagen import generate_tpch
    from datafusion_tpu import ExecutionContext
    from datafusion_tpu.distributed.exchange import TableStore

    data = generate_tpch(0.002)
    ctx = ExecutionContext()
    load_engine_tables(ctx, data)
    store = TableStore(spill_dir=f"{work}/_tables")
    for name in data:
        t = ctx.table(name).collect()
        store.put(name, t)
        client.register_table_schema(name, t.schema())

    sql = get_query_sql(3)
    expected = ctx.sql(sql).collect().to_pydict()

    plan = ctx.optimize(ctx.create_logical_plan(sql))
    job = client.execute_query(serde.plan_to_dict(plan))
    deadline = time.time() + 1200
    status = None
    while time.time() < deadline:
        status = client.get_job_status(job)
        if status["status"] in ("COMPLETED", "FAILED"):
            break
        time.sleep(0.2)
    assert status is not None and status["status"] == "COMPLETED", status
    out = shuffle_io.concat_read(status["final_paths"], status["final_schema"])
    got = out.to_pydict()
    assert list(got) == list(expected) or len(got) == len(expected)
    for k_got, k_exp in zip(got, expected):
        assert got[k_got] == expected[k_exp], f"column {k_got} differs"
