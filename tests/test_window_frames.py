"""Window frame execution (logical_plan/window_frames.rs + the frame-aware
AggregateWindowExpr): ROWS offsets, RANGE peer semantics, defaults —
verified row-for-row against sqlite's window implementation."""

from __future__ import annotations

import sqlite3

import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table

ROWS = {
    "g": ["a", "a", "a", "a", "b", "b", "b", None, None],
    "k": [1, 2, 2, 4, 1, 2, 3, 1, 2],
    "v": [10.0, 20.0, None, 40.0, 5.0, 15.0, 25.0, 7.0, 9.0],
}


@pytest.fixture(scope="module")
def engines():
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict(ROWS))
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE t (g TEXT, k INTEGER, v REAL)")
    conn.executemany(
        "INSERT INTO t VALUES (?,?,?)",
        list(zip(ROWS["g"], ROWS["k"], ROWS["v"])),
    )
    return ctx, conn


def run_both(engines, window_sql: str):
    ctx, conn = engines
    sql = f"SELECT g, k, v, {window_sql} AS w FROM t"
    d = ctx.sql(sql).collect().to_pydict()
    norm = lambda x: None if x is None else round(float(x), 9)
    key = lambda r: (r[0] is not None, r[0] or "", r[1], r[2] is not None, r[2] or 0.0)
    mine = sorted(zip(d["g"], d["k"], d["v"], map(norm, d["w"])), key=key)
    theirs = sorted(
        ((g, k, v, norm(w)) for g, k, v, w in conn.execute(sql).fetchall()), key=key
    )
    assert mine == theirs, window_sql


FRAMES = [
    # default frame with ORDER BY: RANGE UNBOUNDED PRECEDING..CURRENT ROW
    "sum(v) OVER (PARTITION BY g ORDER BY k)",
    "count(v) OVER (PARTITION BY g ORDER BY k)",
    "avg(v) OVER (PARTITION BY g ORDER BY k)",
    # peers matter: k has duplicates inside partition 'a'
    "sum(v) OVER (PARTITION BY g ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
    # whole partition
    "sum(v) OVER (PARTITION BY g)",
    "max(v) OVER (PARTITION BY g)",
    # ROWS frames with offsets
    "sum(v) OVER (PARTITION BY g ORDER BY k, v NULLS FIRST ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)",
    "sum(v) OVER (PARTITION BY g ORDER BY k, v NULLS FIRST ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
    "min(v) OVER (PARTITION BY g ORDER BY k, v NULLS FIRST ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)",
    "max(v) OVER (PARTITION BY g ORDER BY k, v NULLS FIRST ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING)",
    "count(v) OVER (PARTITION BY g ORDER BY k, v NULLS FIRST ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING)",
    "avg(v) OVER (PARTITION BY g ORDER BY k, v NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING)",
    "sum(v) OVER (ORDER BY g NULLS FIRST, k, v NULLS FIRST ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)",
    # unbounded both sides
    "sum(v) OVER (PARTITION BY g ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
    # GROUPS frames (peer-group offsets via bisect over dense peer ids)
    "sum(v) OVER (PARTITION BY g ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW)",
    "sum(v) OVER (PARTITION BY g ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING)",
    "count(v) OVER (PARTITION BY g ORDER BY k GROUPS BETWEEN CURRENT ROW AND 1 FOLLOWING)",
    # RANGE frames with numeric offsets (per-row bisect over the order key)
    "sum(v) OVER (PARTITION BY g ORDER BY k RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)",
    "sum(v) OVER (PARTITION BY g ORDER BY k RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)",
    "count(v) OVER (PARTITION BY g ORDER BY k RANGE BETWEEN CURRENT ROW AND 2 FOLLOWING)",
    "avg(v) OVER (PARTITION BY g ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING)",
]


@pytest.mark.parametrize("wsql", FRAMES)
def test_window_frames_vs_sqlite(engines, wsql):
    run_both(engines, wsql)
