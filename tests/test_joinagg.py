"""FoldCrossJoinAggregate / CrossJoinAggExec (cube_ext/joinagg.rs).

The fused path tiles the cross product instead of materializing |L| x |R|;
these tests pin row-exact parity against pandas on every code path:
single-tile, multi-tile, swapped orientation, no-group, bare cross join,
empty inputs, and plan-serde round-trip."""

import numpy as np
import pandas as pd
import pytest

import datafusion_tpu.ops.joinagg as JA
from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar.table import Table


@pytest.fixture
def ctx():
    rng = np.random.default_rng(7)
    c = ExecutionContext()
    c.register_table(
        "a",
        Table.from_pydict(
            {"g": rng.integers(0, 5, 300), "x": rng.integers(0, 40, 300)}
        ),
    )
    c.register_table(
        "b",
        Table.from_pydict({"y": rng.integers(0, 40, 80), "w": rng.random(80)}),
    )
    return c


def _expected(ctx, cond=True):
    a = ctx.table("a").collect().to_pandas()
    b = ctx.table("b").collect().to_pandas()
    a.columns = [c.split(".")[-1] for c in a.columns]
    b.columns = [c.split(".")[-1] for c in b.columns]
    j = a.merge(b, how="cross")
    if cond:
        j = j[j.x < j.y]
    return j


def test_plan_uses_fused_node(ctx):
    plan = (
        ctx.sql("EXPLAIN SELECT a.g, count(*) FROM a, b WHERE a.x < b.y GROUP BY a.g")
        .collect()
        .to_pandas()
    )
    txt = "\n".join(plan.iloc[:, 1])
    assert "CrossJoinAgg" in txt
    assert "CrossJoinExec" not in txt  # not the materializing operator


def test_grouped_non_equi(ctx):
    out = (
        ctx.sql(
            "SELECT a.g, count(*) c, sum(b.w) s, min(b.y) m FROM a, b "
            "WHERE a.x < b.y GROUP BY a.g ORDER BY a.g"
        )
        .collect()
        .to_pandas()
    )
    exp = (
        _expected(ctx)
        .groupby("g")
        .agg(c=("y", "size"), s=("w", "sum"), m=("y", "min"))
        .reset_index()
        .sort_values("g")
    )
    assert list(out["c"]) == list(exp["c"])
    assert np.allclose(out["s"], exp["s"])
    assert list(out["m"]) == list(exp["m"])


def test_multi_tile_and_swap(ctx, monkeypatch):
    # tiny tiles force the chunk loop; 'a' is larger so orientation swaps
    monkeypatch.setattr(JA, "TILE_ROWS", 1 << 12)
    out = (
        ctx.sql(
            "SELECT a.g, count(*) c, avg(b.w) s FROM a, b "
            "WHERE a.x < b.y GROUP BY a.g ORDER BY a.g"
        )
        .collect()
        .to_pandas()
    )
    exp = (
        _expected(ctx)
        .groupby("g")
        .agg(c=("y", "size"), s=("w", "mean"))
        .reset_index()
        .sort_values("g")
    )
    assert list(out["c"]) == list(exp["c"])
    assert np.allclose(out["s"], exp["s"])


def test_no_group_bare_cross(ctx):
    out = ctx.sql("SELECT count(*) c, sum(a.x) sx FROM a, b").collect().to_pandas()
    j = _expected(ctx, cond=False)
    assert out["c"][0] == len(j)
    assert out["sx"][0] == j.x.sum()


def test_empty_side(ctx):
    ctx.register_table("e", Table.from_pydict({"y": np.array([], dtype=np.int64)}))
    out = ctx.sql("SELECT count(*) c FROM a, e").collect().to_pandas()
    assert out["c"][0] == 0
    out = (
        ctx.sql("SELECT a.g FROM a, e WHERE a.x < e.y GROUP BY a.g")
        .collect()
        .to_pandas()
    )
    assert len(out) == 0


def test_serde_round_trip(ctx):
    from datafusion_tpu.distributed.serde import pplan_from_dict, pplan_to_dict

    plan = ctx.sql(
        "SELECT a.g, count(*) c FROM a, b WHERE a.x < b.y GROUP BY a.g"
    )
    phys = ctx.create_physical_plan(ctx.optimize(plan.logical_plan()))
    d = pplan_to_dict(phys)
    back = pplan_from_dict(d)
    assert "CrossJoinAggExec" in back.display()
