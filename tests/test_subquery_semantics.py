"""Subquery semantics regressions (round 5):

1. NULL-aware NOT IN (optimizer/decorrelate.py): a plain anti join gets
   three-valued logic wrong — any NULL in the subquery disqualifies every
   probe row, and a NULL probe qualifies only against an EMPTY subquery
   (verified against sqlite).
2. Plan-cache identity: subquery expr reprs must render the subquery BODY
   — ExecutionContext._plan_cache keys on the logical plan's display, and
   two queries differing only inside a subquery used to collide, silently
   serving the first query's compiled plan.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.types.dtypes import STRING


def _ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "t", Table.from_pydict({"a": [1, 2, 3, None], "s": ["x", "y", "x", None]})
    )
    ctx.register_table("u", Table.from_pydict({"s": ["x", "z"], "v": [10, 20]}))
    ctx.register_table("un", Table.from_pydict({"s": ["x", None], "v": [10, 20]}))
    ctx.register_table(
        "ue", Table.from_pydict({"s": [], "v": []}, dtypes={"s": STRING})
    )
    return ctx


CASES = [
    ("u", ["y"]),  # plain: NULL probe excluded (matches sqlite)
    ("un", []),  # NULL in subquery: nothing qualifies
    ("ue", ["x", "y", "x", None]),  # empty subquery: everything qualifies
]


@pytest.mark.parametrize("order", ["fwd", "rev"])
def test_null_aware_not_in(order):
    ctx = _ctx()
    cases = CASES if order == "fwd" else CASES[::-1]
    for tb, want in cases:
        got = ctx.sql(
            f"SELECT s FROM t WHERE s NOT IN (SELECT s FROM {tb})"
        ).collect().to_pydict()
        assert got == {"s": want}, tb


def test_null_aware_not_in_correlated():
    """Per-group 3VL for correlated NOT IN (verified against sqlite):
    a NULL in row r's GROUP disqualifies r; a NULL probe qualifies only
    when r's group is empty; an outer NULL correlation key means an
    empty group (= qualifies)."""
    ctx = ExecutionContext()
    ctx.register_table(
        "o",
        Table.from_pydict(
            {
                "id": [1, 2, 3, 4, 5, 6],
                "g": [1, 2, 2, 2, 3, None],
                "x": [99, 99, 10, None, None, 5],
            }
        ),
    )
    ctx.register_table(
        "s", Table.from_pydict({"g": [1, 1, 2], "v": [10, None, 10]})
    )
    got = ctx.sql(
        "SELECT id FROM o WHERE x NOT IN (SELECT v FROM s WHERE s.g = o.g) "
        "ORDER BY id"
    ).collect().to_pydict()
    # id=1: group {10,NULL} -> NULL -> out; id=2: 99 NOT IN {10} -> in;
    # id=3: 10 IN {10} -> out; id=4: NULL probe, non-empty group -> out;
    # id=5: empty group -> in (even with NULL probe); id=6: NULL key ->
    # empty group -> in
    assert got == {"id": [2, 5, 6]}


def test_in_subquery_null_semantics():
    ctx = _ctx()
    # positive IN: NULL probe/build rows simply never match
    got = ctx.sql("SELECT s FROM t WHERE s IN (SELECT s FROM un)").collect().to_pydict()
    assert got == {"s": ["x", "x"]}


def test_plan_cache_distinguishes_subquery_bodies():
    # same outer text, different subquery body: each must run its own plan
    ctx = _ctx()
    a = ctx.sql("SELECT count(*) AS c FROM t WHERE s IN (SELECT s FROM u)").collect().to_pydict()
    b = ctx.sql("SELECT count(*) AS c FROM t WHERE s IN (SELECT s FROM un)").collect().to_pydict()
    assert a == {"c": [2]}
    assert b == {"c": [2]}
    c = ctx.sql(
        "SELECT count(*) AS c FROM t WHERE s IN (SELECT s FROM u WHERE v > 10)"
    ).collect().to_pydict()
    assert c == {"c": [0]}


def test_scalar_subquery_bodies_not_conflated():
    ctx = _ctx()
    a = ctx.sql("SELECT count(*) AS c FROM t WHERE a > (SELECT min(v) FROM u) - 9").collect().to_pydict()
    b = ctx.sql("SELECT count(*) AS c FROM t WHERE a > (SELECT max(v) FROM u) - 18").collect().to_pydict()
    assert a == {"c": [2]}  # a > 1
    assert b == {"c": [1]}  # a > 2
