"""UDF / UDAF registration + execution (udf.rs:38, udaf.rs:44,
context.rs:249,264 register_udf/register_udaf)."""

from __future__ import annotations

import jax.numpy as jnp
import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.functions.udf import create_udaf, create_udf
from datafusion_tpu.types.dtypes import FLOAT64, INT64


@pytest.fixture()
def ctx():
    c = ExecutionContext()
    c.register_table(
        "t",
        Table.from_pydict(
            {"g": ["a", "a", "b", "b", "b"], "x": [1, 2, 3, None, 5]}
        ),
    )
    return c


def test_scalar_udf(ctx):
    ctx.register_udf(
        create_udf("plus_one", [INT64], INT64, lambda x: x + 1)
    )
    out = ctx.sql("SELECT plus_one(x) AS y FROM t ORDER BY y NULLS LAST").collect()
    assert out.to_pydict() == {"y": [2, 3, 4, 6, None]}


def test_scalar_udf_two_args_null_propagation(ctx):
    ctx.register_udf(
        create_udf("mul_add", [INT64, INT64], INT64, lambda a, b: a * 10 + b)
    )
    out = ctx.sql(
        "SELECT g, mul_add(x, x) AS y FROM t ORDER BY g, y NULLS LAST"
    ).collect()
    assert out.to_pydict()["y"] == [11, 22, 33, 55, None]


def test_scalar_udf_in_where_and_projection(ctx):
    ctx.register_udf(create_udf("sq", [INT64], INT64, lambda x: x * x))
    out = ctx.sql("SELECT sum(sq(x)) AS s FROM t WHERE sq(x) > 1").collect()
    # 4 + 9 + 25
    assert out.to_pydict() == {"s": [38]}


def test_udaf_grouped(ctx):
    ctx.register_udaf(
        create_udaf(
            "sum_sq", INT64, INT64, zero=0, step=lambda a, b: a + b,
        )
    )
    # monoid over squared inputs: sum of squares via sq() + sum_sq
    ctx.register_udf(create_udf("sq", [INT64], INT64, lambda x: x * x))
    out = ctx.sql(
        "SELECT g, sum_sq(sq(x)) AS ss FROM t GROUP BY g ORDER BY g"
    ).collect()
    assert out.to_pydict() == {"g": ["a", "b"], "ss": [5, 34]}


def test_udaf_product_no_group(ctx):
    ctx.register_udaf(
        create_udaf("product", INT64, INT64, zero=1, step=lambda a, b: a * b)
    )
    out = ctx.sql("SELECT product(x) AS p FROM t").collect()
    assert out.to_pydict() == {"p": [30]}  # 1*2*3*5 (NULL skipped)


def test_udaf_with_finalize(ctx):
    ctx.register_udaf(
        create_udaf(
            "geo_mean_log",
            FLOAT64,
            FLOAT64,
            zero=0.0,
            step=lambda a, b: a + b,
            finalize=lambda acc, cnt: acc / jnp.maximum(cnt, 1),
        )
    )
    out = ctx.sql("SELECT g, geo_mean_log(x) AS m FROM t GROUP BY g ORDER BY g").collect()
    d = out.to_pydict()
    assert d["m"][0] == pytest.approx(1.5)  # (1+2)/2
    assert d["m"][1] == pytest.approx(4.0)  # (3+5)/2