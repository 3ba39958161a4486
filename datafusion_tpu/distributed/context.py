"""DistributedContext: the BallistaContext equivalent.

Mirrors /root/reference/ballista/rust/client/src/context.rs:97 — a SQL /
DataFrame facade that registers tables client-side, ships serialized
logical plans to the scheduler (ExecuteQuery), polls GetJobStatus, and
fetches completed final-stage partitions.  `standalone` mode spins the
scheduler plus N executors inside the client process
(context.rs:83-115 + state/standalone.rs), which is also the unit-test
harness for the whole distributed FSM — no cluster required.

On a real TPU pod: one DistributedContext per driver, one executor per
host (its slice runs stage subtrees through the single-chip engine or the
SPMD parallel path), shuffle spill on the pod's shared filesystem, and the
same scheduler/FSM for cross-slice orchestration.
"""

from __future__ import annotations

import tempfile
import time

from ..columnar.table import Table
from ..errors import ExecutionError, PlanError
from ..execution.context import ExecutionContext
from . import serde, shuffle_io
from .exchange import TableStore
from .executor import Executor
from .scheduler import Scheduler
from .state import SchedulerState


class DistributedContext:
    def __init__(
        self,
        standalone: bool = True,
        num_executors: int = 2,
        target_partitions: int = 4,
        work_dir: str | None = None,
        mesh_devices: int | None = None,
    ):
        if not standalone:
            raise PlanError(
                "only standalone (in-proc) clusters are supported in-process; "
                "multi-host mode uses rpc.serve_scheduler/rpc.run_executor"
            )
        self.work_dir = work_dir or tempfile.mkdtemp(prefix="dftpu_shuffle_")
        self.store = TableStore()
        self.scheduler = Scheduler(
            SchedulerState(work_dir=self.work_dir),
            work_dir=self.work_dir,
            target_partitions=target_partitions,
        )
        self.executors = [
            Executor(
                f"executor-{i}", self.scheduler, self.store,
                mesh_devices=mesh_devices,
            )
            for i in range(num_executors)
        ]
        for e in self.executors:
            e.start()
        # a local context for parsing/optimizing (the client embeds a full
        # planning stack, exactly like BallistaContext embedding DataFusion)
        self._planning_ctx = ExecutionContext()

    def close(self):
        for e in self.executors:
            e.stop()

    # ---- registration (client-side, context.rs:97+) -----------------------
    def register_table(self, name: str, table: Table):
        self.store.put(name, table)
        self._planning_ctx.register_table(name, table)
        self.scheduler.register_table_schema(name, table.schema())

    def register_csv(self, name: str, path: str, **kw):
        self._planning_ctx.register_csv(name, path, **kw)
        t = self._planning_ctx.table(name).collect()
        self.store.put(name, t)
        self.scheduler.register_table_schema(name, t.schema())

    def register_parquet(self, name: str, path: str):
        self._planning_ctx.register_parquet(name, path)
        t = self._planning_ctx.table(name).collect()
        self.store.put(name, t)
        self.scheduler.register_table_schema(name, t.schema())

    def tables(self) -> list[str]:
        return self.store.names()

    # ---- query ---------------------------------------------------------------
    def sql(self, query: str) -> "DistributedDataFrame":
        plan = self._planning_ctx.create_logical_plan(query)
        plan = self._planning_ctx.optimize(plan)
        return DistributedDataFrame(self, plan)

    def execute_logical_plan(self, plan) -> Table:
        # ship over the serde contract (ExecuteQuery's proto round-trip)
        plan_dict = serde.plan_to_dict(plan)
        job_id = self.scheduler.execute_query(plan_dict)
        out = self._await_job(job_id)
        # final output uses unqualified display names (same as the local
        # ExecutionContext.collect contract)
        display = [f.name for f in plan.schema().fields]
        if len(display) == len(out.names):
            out = Table(display, out.columns, out.nrows)
        return out

    def _await_job(self, job_id: str, timeout_s: float = 300.0) -> Table:
        t0 = time.time()
        while True:
            status = self.scheduler.get_job_status(job_id)
            if status["status"] == "COMPLETED":
                return shuffle_io.concat_read(
                    status["final_paths"], status["final_schema"]
                )
            if status["status"] == "FAILED":
                raise ExecutionError(f"job {job_id} failed: {status['error']}")
            if time.time() - t0 > timeout_s:
                raise ExecutionError(f"job {job_id} timed out")
            time.sleep(0.005)


class DistributedDataFrame:
    """Lazy handle: logical plan + owning context (BallistaDataFrame)."""

    def __init__(self, ctx: DistributedContext, plan):
        self.ctx = ctx
        self.plan = plan

    def logical_plan(self):
        return self.plan

    def collect(self) -> Table:
        return self.ctx.execute_logical_plan(self.plan)

    def explain(self) -> str:
        return self.plan.display()
