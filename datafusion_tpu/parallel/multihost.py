"""Multi-host SPMD bring-up: jax.distributed + a global mesh over DCN+ICI.

The reference scales out as a networked Ballista cluster — a gRPC
scheduler plus one executor process per machine
(/root/reference/ballista/rust/scheduler/src/lib.rs:312,
/root/reference/ballista/rust/executor/src/execution_loop.rs:39).  The TPU
analogue has TWO cooperating planes (SURVEY.md §7 step 7):

  intra-slice   ONE multi-controller SPMD program over all hosts' chips:
                `jax.distributed.initialize` joins every process to a
                coordination service, `jax.devices()` becomes the GLOBAL
                device list, and a Mesh over it makes XLA route
                collectives over ICI within a slice and DCN across
                slices.  This module owns that bring-up.
  inter-slice   the stage-DAG scheduler/executor layer (distributed/):
                independent slices exchange whole shuffle partitions via
                spill files; each executor drives its local slice's mesh
                (Executor(mesh_devices=...)).

Env-driven configuration mirrors the launchers TPU pods already use
(GKE/QueuedResources export these):

  DFTPU_COORDINATOR    host:port of process 0's coordination service
  DFTPU_NUM_PROCESSES  total process count
  DFTPU_PROCESS_ID     this process's rank

With none set and a single process, initialize() is a no-op — the
single-host path stays untouched (no coordination service required).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Join this process to the multi-host JAX runtime.

    Arguments default from DFTPU_COORDINATOR / DFTPU_NUM_PROCESSES /
    DFTPU_PROCESS_ID (falling back to jax.distributed's own autodetection
    on TPU pods, where the libtpu metadata provides them).  Returns True
    when a multi-process runtime was (or already is) initialized, False
    for the single-process no-op.  Idempotent.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get("DFTPU_COORDINATOR")
    if num_processes is None and os.environ.get("DFTPU_NUM_PROCESSES"):
        num_processes = int(os.environ["DFTPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("DFTPU_PROCESS_ID"):
        process_id = int(os.environ["DFTPU_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # bare single-process run: nothing to join.  (On a real TPU pod
        # slice jax.distributed.initialize() autodetects from libtpu —
        # callers there should pass num_processes or set the env vars to
        # opt in explicitly; guessing here would hang single-host runs.)
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def global_mesh():
    """Mesh over every chip of every joined host.  XLA lowers collectives
    to ICI within a slice and DCN across slices from the device topology —
    the program text (shard_map + psum/all_to_all in parallel/ops.py) is
    identical to the single-host case."""
    from .mesh import make_mesh

    return make_mesh(devices=jax.devices())


def process_info() -> tuple[int, int]:
    """(process_id, num_processes) of the joined runtime (0, 1 when
    single-process)."""
    return jax.process_index(), jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()
