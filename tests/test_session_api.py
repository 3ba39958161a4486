"""Session-layer surface: information_schema, write_csv/write_parquet,
variables, SHOW, EXPLAIN, catalogs (context.rs equivalents)."""

from __future__ import annotations

import os

import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.types import ScalarValue


@pytest.fixture()
def ctx():
    c = ExecutionContext()
    c.register_table("t", Table.from_pydict({"a": [1, 2], "s": ["x", "y"]}))
    return c


def test_information_schema_tables(ctx):
    out = ctx.sql("SELECT * FROM information_schema.tables").collect()
    d = out.to_pydict()
    assert "t" in d["table_name"]


def test_information_schema_columns(ctx):
    out = ctx.sql(
        "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_name = 't' ORDER BY column_name"
    ).collect()
    d = out.to_pydict()
    assert d["column_name"] == ["a", "s"]


def test_write_csv_roundtrip(ctx, tmp_path):
    p = str(tmp_path / "out.csv")
    ctx.write_csv(ctx.sql("SELECT a, s FROM t ORDER BY a"), p)
    c2 = ExecutionContext()
    c2.register_csv("u", p)
    assert c2.sql("SELECT a, s FROM u ORDER BY a").collect().to_pydict() == {
        "a": [1, 2],
        "s": ["x", "y"],
    }


def test_write_parquet_roundtrip(ctx, tmp_path):
    p = str(tmp_path / "out.parquet")
    ctx.write_parquet(ctx.sql("SELECT a, s FROM t ORDER BY a"), p)
    c2 = ExecutionContext()
    c2.register_parquet("u", p)
    assert c2.sql("SELECT sum(a) AS s FROM u").collect().to_pydict() == {"s": [3]}


def test_variables(ctx):
    ctx.register_variable("user", lambda name: ScalarValue.utf8("alice") if name == "@name" else None)
    out = ctx.sql("SELECT @name AS who FROM t LIMIT 1").collect()
    assert out.to_pydict() == {"who": ["alice"]}


def test_show_variable(ctx):
    out = ctx.sql("SHOW datafusion.execution.batch_size").collect()
    d = out.to_pydict()
    assert d["name"] == ["datafusion.execution.batch_size"]


def test_create_table_as_and_drop(ctx):
    ctx.sql("CREATE TABLE t2 AS SELECT a * 2 AS b FROM t")
    assert ctx.sql("SELECT sum(b) AS s FROM t2").collect().to_pydict() == {"s": [6]}
    ctx.sql("DROP TABLE t2")
    with pytest.raises(Exception):
        ctx.sql("SELECT * FROM t2").collect()


def test_views(ctx):
    ctx.sql("CREATE VIEW v AS SELECT a + 1 AS b FROM t")
    assert ctx.sql("SELECT max(b) AS m FROM v").collect().to_pydict() == {"m": [3]}
    ctx.sql("DROP VIEW v")


def test_explain_verbose_captures_rules(ctx):
    d = ctx.sql("EXPLAIN VERBOSE SELECT a FROM t WHERE a > 1 + 1").collect().to_pydict()
    kinds = d["plan_type"]
    assert kinds[0] == "initial_logical_plan"
    assert any(k.startswith("logical_plan after ") for k in kinds)
    assert kinds[-1] == "physical_plan"


def test_display_graphviz():
    from datafusion_tpu import ExecutionContext
    from datafusion_tpu.columnar import Table

    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"a": [1, 2], "b": [3.0, 4.0]}))
    plan = ctx.optimize(
        ctx.create_logical_plan("SELECT a, sum(b) FROM t WHERE a > 0 GROUP BY a")
    )
    dot = plan.display_graphviz()
    assert dot.startswith("digraph {") and dot.endswith("}")
    assert "Aggregate" in dot and "->" in dot


def test_sysvar_double_at():
    from datafusion_tpu import ExecutionContext
    from datafusion_tpu.columnar import Table
    from datafusion_tpu.types import ScalarValue

    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"a": [1]}))

    def provider(name):
        if name == "@@version":
            return ScalarValue.utf8("v1.0")
        if name == "@uservar":
            return ScalarValue.int64(7)
        return None

    ctx.register_variable("vars", provider)
    out = ctx.sql("SELECT @@version AS v, @uservar AS m FROM t").collect().to_pydict()
    assert out == {"v": ["v1.0"], "m": [7]}
