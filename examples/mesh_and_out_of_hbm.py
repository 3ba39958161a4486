"""SPMD mesh execution + out-of-HBM host-resident tables.

Two scale-out surfaces on one chip-count-agnostic API:

1. `df.collect(mesh=...)` lowers ANY plan onto a `jax.sharding.Mesh`
   (the ICI analogue of Ballista distributing an arbitrary plan,
   scheduler/src/planner.rs:40-171).  On a CPU dev box, set
   XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual mesh.
2. `register_host_table(...)` / `register_parquet(host_resident=True)`
   keeps a table in host RAM and streams fixed-capacity morsels through
   one compiled stage — including streamed joins against HBM-resident
   build sides (reference: parquet.rs:596-636 streaming scans,
   hash_join.rs streamed probes).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# entry point we own: re-assert the env choice (or default cpu) over the
# axon site hook's 'axon,cpu' preset — the env var alone is overridden
jax.config.update(
    "jax_platforms", os.environ.get("JAX_PLATFORMS") or "cpu"
)

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.parallel.mesh import make_mesh


def main():
    n = 50_000
    lineitem = {
        "okey": [i % 9_000 for i in range(n)],
        "qty": [(i * 7) % 50 + 1 for i in range(n)],
        "flag": ["A", "B", "C"][0] if False else ["ABC"[i % 3] for i in range(n)],
    }
    orders = {
        "okey2": list(range(9_000)),
        "cust": [i % 300 for i in range(9_000)],
    }

    # ---- mesh execution: same SQL, N chips --------------------------------
    ctx = ExecutionContext()
    ctx.register_table("li", Table.from_pydict(lineitem))
    ctx.register_table("o", Table.from_pydict(orders))
    sql = (
        "SELECT o.cust, count(*) AS c, sum(li.qty) AS sq "
        "FROM li JOIN o ON li.okey = o.okey2 "
        "GROUP BY o.cust ORDER BY sq DESC, o.cust LIMIT 5"
    )
    mesh = make_mesh()  # all visible devices
    single = ctx.sql(sql).collect().to_pydict()
    sharded = ctx.sql(sql).collect(mesh=mesh).to_pydict()
    assert single == sharded
    print(f"mesh({mesh.devices.size} devices) ==", sharded)

    # ---- out-of-HBM: lineitem stays in host RAM, streams morsels ----------
    big = ExecutionContext()
    big.register_host_table("li", Table.from_pydict(lineitem), morsel_rows=16_384)
    big.register_table("o", Table.from_pydict(orders))
    streamed = big.sql(sql).collect().to_pydict()
    assert streamed == single
    print("morsel-streamed join ==", streamed)


if __name__ == "__main__":
    main()
