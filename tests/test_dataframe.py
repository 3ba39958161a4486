"""DataFrame API (dataframe.rs + execution/dataframe_impl.rs:143 +
tests/dataframe.rs equivalents): lazy builders mirroring LogicalPlan."""

from __future__ import annotations

import pytest

from datafusion_tpu import ExecutionContext, col, lit
from datafusion_tpu.columnar import Table
from datafusion_tpu.logical.expr import AggregateFunction, Alias, SortExpr


@pytest.fixture()
def ctx():
    c = ExecutionContext()
    c.register_table(
        "t",
        Table.from_pydict(
            {"a": [1, 2, 3, 4], "b": ["x", "y", "x", "y"], "c": [1.5, 2.5, 3.5, 4.5]}
        ),
    )
    c.register_table("u", Table.from_pydict({"a": [2, 3], "d": ["p", "q"]}))
    return c


def test_select_filter_sort_limit(ctx):
    df = (
        ctx.table("t")
        .filter(col("a") > lit(1))
        .select(col("a"), Alias(col("c") * lit(2.0), "c2"))
        .sort(SortExpr(col("a"), False, False))
        .limit(2)
    )
    assert df.collect().to_pydict() == {"a": [4, 3], "c2": [9.0, 7.0]}


def test_aggregate(ctx):
    df = ctx.table("t").aggregate(
        [col("b")],
        [
            Alias(AggregateFunction("sum", [col("a")]), "s"),
            Alias(AggregateFunction("max", [col("c")]), "m"),
        ],
    ).sort(SortExpr(col("b"), True, False))
    assert df.collect().to_pydict() == {"b": ["x", "y"], "s": [4, 6], "m": [3.5, 4.5]}


def test_join(ctx):
    df = (
        ctx.table("t")
        .join(ctx.table("u"), ["a"], ["a"], "inner")
        .select(col("b"), col("d"))
        .sort(SortExpr(col("d"), True, False))
    )
    assert df.collect().to_pydict() == {"b": ["y", "x"], "d": ["p", "q"]}


def test_union_distinct_skip(ctx):
    half = ctx.table("t").select(col("b"))
    df = half.union(half).distinct().sort(SortExpr(col("b"), True, False))
    assert df.collect().to_pydict() == {"b": ["x", "y"]}
    df2 = ctx.table("t").sort(SortExpr(col("a"), True, False)).skip(2).limit(1)
    assert df2.collect().to_pydict()["a"] == [3]


def test_explain_and_schema(ctx):
    df = ctx.table("t").filter(col("a") > lit(2))
    text = df.logical_plan().display()
    assert "Filter" in text and "TableScan" in text
    assert [f.name for f in df.schema().fields] == ["a", "b", "c"]


def test_select_columns(ctx):
    assert ctx.table("t").select_columns("b", "a").collect().names == ["b", "a"]


def test_bare_table_collect_keeps_all_columns(ctx):
    # regression: ProjectionPushDown must not prune output-visible scan
    # columns when the scan is the plan root (no Projection above it)
    out = ctx.table("t").collect()
    assert out.names == ["a", "b", "c"]
    assert out.nrows == 4
    # ...including through pass-through nodes (filter/sort/limit)
    out = ctx.table("t").filter(col("a") > lit(1)).sort(col("a")).limit(2).collect()
    assert out.names == ["a", "b", "c"]
    assert out.nrows == 2


def test_repartition_and_collect_partitioned():
    """dataframe.rs repartition + collect_partitioned parity: the exchange
    hint is a no-op single-device; collect_partitioned returns one Table
    per mesh shard whose union is the full result."""
    from datafusion_tpu.logical.expr import col
    from datafusion_tpu.parallel.mesh import make_mesh

    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {"k": list(range(100)), "g": [i % 5 for i in range(100)]}
        ),
    )
    df = ctx.sql("SELECT k, g FROM t WHERE k >= 10")
    assert df.repartition(4).collect().to_pydict()["k"][:3] == [10, 11, 12]
    assert sorted(
        df.repartition(4, col("g")).collect().to_pydict()["k"]
    ) == list(range(10, 100))
    parts = df.collect_partitioned()
    assert len(parts) == 1 and parts[0].nrows == 90
    mparts = df.collect_partitioned(mesh=make_mesh(8))
    assert len(mparts) == 8
    assert sorted(
        x for p in mparts for x in p.to_pydict()["k"]
    ) == list(range(10, 100))
