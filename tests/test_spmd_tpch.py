"""TPC-H over the SPMD mesh: every reference query runs multi-chip.

The reference distributes arbitrary plans (ballista/rust/scheduler/src/
planner.rs:40-171 stage-splits any operator tree); our analogue is
SpmdExecutor lowering any physical plan onto the jax.sharding.Mesh.  This
sweep proves parity: each query runs on the 8-virtual-device CPU mesh and
its rows must match the sqlite golden answers exactly — identical to the
single-device contract in test_tpch.py.

The full 22-query sweep takes several minutes of XLA compiles, so by
default CI runs a representative core (aggregation, multi-join + sort,
semi, left, anti, distinct); set DFTPU_SPMD_FULL=1 for all 22.
"""

import os

import pytest

from bench.tpch import check

# q1 fused aggregate; q3 join+join+sort+limit; q4 EXISTS->semi;
# q13 LEFT join + distinct-count shape; q16 NOT IN + count(distinct);
# q21 4-way join + semi + anti; q22 anti + scalar subquery
CORE = [1, 3, 4, 13, 16, 21, 22]
QUERIES = (
    list(range(1, 23)) if os.environ.get("DFTPU_SPMD_FULL") else CORE
)


@pytest.fixture(scope="session")
def spmd_results():
    from datafusion_tpu.parallel.mesh import make_mesh

    return check(0.002, QUERIES, verbose=False, mesh=make_mesh())


@pytest.mark.parametrize("q", QUERIES)
def test_spmd_tpch_query(q, spmd_results):
    err = spmd_results[q]
    assert err is None, f"q{q} (SPMD mesh): {err}"
