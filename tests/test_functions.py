"""Scalar-function coverage beyond test_sql.py: the array constructor
(reference array_expressions.rs) and its interaction with row movement."""

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table


def test_array_constructor_numeric_and_null():
    """array(...) -> FixedSizeList (reference array_expressions.rs:63,
    return type functions.rs:368); element nulls preserved through
    filters/sorts via in-band sentinels."""
    ctx = ExecutionContext()
    t = Table.from_pydict(
        {"a": [1, 2, 3], "b": [4.0, None, 6.0], "s": ["x", "y", "z"],
         "s2": ["p", None, "x"]}
    )
    ctx.register_table("t", t)
    out = ctx.sql(
        "SELECT array(a, b) AS ab, array(s, s2) AS ss, array(a, a, 7) AS aa "
        "FROM t WHERE a > 1"
    ).collect()
    d = out.to_pydict()
    assert d["ab"] == [[2.0, None], [3.0, 6.0]]
    assert d["ss"] == [["y", None], ["z", "x"]]
    assert d["aa"] == [[2, 2, 7], [3, 3, 7]]

    out2 = ctx.sql("SELECT array(a, b) AS ab FROM t ORDER BY a DESC").collect()
    assert out2.to_pydict()["ab"] == [[3.0, 6.0], [2.0, None], [1.0, 4.0]]


def test_convert_tz_literal_and_column_shift():
    """convert_tz(ts, '+HH:MM') adds (hour*60 + signum(hour)*minute)
    minutes (fork cube_ext, datetime_expressions.rs:51-113) — including
    the signum quirk where a 0-hour shift drops the minutes."""
    import datetime as dt

    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "d": ["2021-03-04 05:06:07", "2022-01-01 00:00:00"],
                "s": ["+05:30", "-03:15"],
            }
        ),
    )
    lit = ctx.sql(
        "SELECT convert_tz(CAST(d AS TIMESTAMP), '+05:30') AS a FROM t"
    ).collect().to_pydict()
    assert lit["a"] == [
        dt.datetime(2021, 3, 4, 10, 36, 7),
        dt.datetime(2022, 1, 1, 5, 30),
    ]
    col = ctx.sql(
        "SELECT convert_tz(CAST(d AS TIMESTAMP), s) AS b FROM t"
    ).collect().to_pydict()
    assert col["b"] == [
        dt.datetime(2021, 3, 4, 10, 36, 7),
        dt.datetime(2021, 12, 31, 20, 45),
    ]
    zero = ctx.sql(
        "SELECT convert_tz(CAST(d AS TIMESTAMP), '-00:30') AS z FROM t"
    ).collect().to_pydict()
    assert zero["z"][0] == dt.datetime(2021, 3, 4, 5, 6, 7)
