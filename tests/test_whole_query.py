"""Whole-query compilation (physical/query_compiler.py): warm plans trace
into ONE XLA program; results must match node-by-node execution, and
speculative overflows must invalidate the program and rerun exactly.

Reference anchor: one plan, one execution
(/root/reference/datafusion/src/physical_plan/planner.rs:341) — the TPU
translation is one *program*.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.physical import query_compiler as QC


def _ctx(n=5000, keys=200):
    rng = np.random.default_rng(7)
    ctx = ExecutionContext()
    ctx.register_table(
        "f",
        Table.from_pydict(
            {
                "k": rng.integers(0, keys, n).tolist(),
                "x": rng.integers(0, 1000, n).tolist(),
            }
        ),
    )
    ctx.register_table(
        "d",
        Table.from_pydict(
            {
                "k": list(range(keys)),
                "y": rng.integers(0, 50, keys).tolist(),
            }
        ),
    )
    ctx.register_table(
        "e",
        Table.from_pydict(
            {"y2": list(range(50)), "z": rng.integers(0, 8, 50).tolist()}
        ),
    )
    return ctx


def _wq(ctx):
    key = list(ctx._plan_cache)[-1]
    return getattr(ctx._plan_cache[key], "_whole_query", None)


def test_multi_join_aggregate_fuses_and_matches():
    ctx = _ctx()
    sql = (
        "SELECT z, count(*) AS c, sum(x) AS sx FROM f "
        "JOIN d ON f.k = d.k JOIN e ON d.y = e.y2 GROUP BY z ORDER BY z"
    )
    cold = ctx.sql(sql).collect().to_pydict()
    warm = [ctx.sql(sql).collect().to_pydict() for _ in range(3)]
    wq = _wq(ctx)
    assert wq is not None and wq._fn is not None, "whole-query did not engage"
    for w in warm:
        assert w == cold


def test_filters_projections_sorts_fuse():
    ctx = _ctx()
    sql = (
        "SELECT f.k, x + 1 AS x1, y FROM f JOIN d ON f.k = d.k "
        "WHERE x > 100 AND y < 40 ORDER BY x1 DESC LIMIT 17"
    )
    cold = ctx.sql(sql).collect().to_pydict()
    for _ in range(3):
        assert ctx.sql(sql).collect().to_pydict() == cold
    wq = _wq(ctx)
    assert wq is not None and wq._fn is not None


def test_overflow_invalidates_and_reruns_exactly():
    # grow the probe-side data after the program is built: learned
    # capacities overflow, the window reruns exactly, and the next warm
    # run re-traces with the new sizes
    ctx = _ctx(n=5000)
    sql = "SELECT count(*) AS c, sum(x) AS sx FROM f JOIN d ON f.k = d.k WHERE y < 25"
    cold = ctx.sql(sql).collect().to_pydict()
    for _ in range(2):
        assert ctx.sql(sql).collect().to_pydict() == cold
    wq = _wq(ctx)
    assert wq is not None and wq._fn is not None

    # same-signature (same capacity bucket) but different selectivity via
    # re-registered d: y values all pass the filter now
    rng = np.random.default_rng(7)
    ctx.register_table(
        "d",
        Table.from_pydict({"k": list(range(200)), "y": [0] * 200}),
    )
    want_c = 5000
    got = ctx.sql(sql).collect().to_pydict()
    assert got["c"] == [want_c]
    for _ in range(2):
        assert ctx.sql(sql).collect().to_pydict() == got


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("DFTPU_NO_WHOLE_QUERY", "1")
    ctx = _ctx()
    sql = "SELECT count(*) AS c FROM f JOIN d ON f.k = d.k"
    cold = ctx.sql(sql).collect().to_pydict()
    for _ in range(3):
        assert ctx.sql(sql).collect().to_pydict() == cold
    wq = _wq(ctx)
    assert wq is None or wq._fn is None


def test_semi_join_subquery_matches():
    ctx = _ctx()
    sql = (
        "SELECT count(*) AS c FROM f WHERE f.k IN "
        "(SELECT k FROM d WHERE y > 25)"
    )
    cold = ctx.sql(sql).collect().to_pydict()
    for _ in range(3):
        assert ctx.sql(sql).collect().to_pydict() == cold
