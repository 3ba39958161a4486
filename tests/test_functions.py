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
