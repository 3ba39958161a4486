"""Multi-host SPMD: jax.distributed bring-up + TPC-H over a global mesh.

The reference scales across machines as a Ballista cluster
(/root/reference/ballista/rust/scheduler/src/lib.rs:312 + one executor
process per host, executor/src/execution_loop.rs:39).  The TPU-native
intra-slice analogue (SURVEY.md §7 step 7): every process joins ONE
multi-controller JAX runtime (parallel/multihost.py), a Mesh spans all
hosts' devices, and the SAME SPMD query programs (parallel/ops.py) run
unchanged — XLA routes collectives over ICI within a slice and DCN
across.  Simulated here with 2 processes x 4 virtual CPU devices wired
through jax.distributed's coordination service (Gloo collectives).
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["DFTPU_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["DFTPU_NUM_PROCESSES"] = "2"
os.environ["DFTPU_PROCESS_ID"] = str(rank)
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
from datafusion_tpu.parallel import multihost
assert multihost.initialize()
assert len(jax.devices()) == 8, jax.devices()
assert multihost.process_info() == (rank, 2)
from bench.tpch import check
mesh = multihost.global_mesh()
res = check(0.002, [1, 3], verbose=False, mesh=mesh)
bad = {q: e for q, e in res.items() if e is not None}
assert not bad, bad
print("MULTIHOST_OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_tpch_over_two_process_global_mesh(tmp_path):
    """q1 (fused aggregate) + q3 (two joins + sort + limit) run golden-exact
    on a mesh spanning two OS processes' devices — the full multi-host
    story: env-driven bring-up, global mesh, cross-process collectives."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = []
    logs = []
    for rank in range(2):
        log = open(tmp_path / f"rank{rank}.log", "wb")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER, str(rank), str(port), repo],
                env=env,
                stdout=log,
                stderr=subprocess.STDOUT,
                cwd=repo,
            )
        )
    try:
        for p in procs:
            p.wait(timeout=1100)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for f in logs:
            f.close()
    for rank, p in enumerate(procs):
        out = (tmp_path / f"rank{rank}.log").read_bytes().decode(errors="replace")
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, out[-4000:]
