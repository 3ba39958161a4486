"""PushdownSemiAnti (optimizer/semi_join_pushdown.py): decorrelated
IN/EXISTS semi/anti joins sink below inner joins whose one side covers
their probe columns — and never sink when columns straddle both sides."""

import jax

jax.config.update("jax_platforms", "cpu")

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table


def _ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "o", Table.from_pydict({"ok": [1, 2, 3, 4], "ck": [10, 10, 20, 20]})
    )
    ctx.register_table(
        "c", Table.from_pydict({"ck": [10, 20], "name": ["a", "b"]})
    )
    ctx.register_table(
        "l", Table.from_pydict({"ok": [1, 1, 2, 3, 3, 3], "qty": [5, 6, 1, 9, 9, 9]})
    )
    return ctx


SQL = (
    "SELECT name, o.ok FROM c JOIN o ON c.ck = o.ck "
    "WHERE o.ok IN (SELECT ok FROM l GROUP BY ok HAVING sum(qty) > 10) "
    "ORDER BY o.ok"
)


def test_semi_sinks_below_inner_join():
    ctx = _ctx()
    plan = ctx.optimize(ctx.create_logical_plan(SQL)).display()
    # the semi join must appear BELOW the inner join (deeper indentation)
    lines = plan.splitlines()
    semi = next(i for i, l in enumerate(lines) if "Join(semi)" in l)
    inner = next(i for i, l in enumerate(lines) if "Join(inner)" in l)
    depth = lambda l: len(l) - len(l.lstrip())
    assert depth(lines[semi]) > depth(lines[inner]), plan
    # and its probe child is the orders scan, not the joined table
    assert "TableScan: o" in lines[semi + 1], plan


def test_pushed_semi_results_exact():
    ctx = _ctx()
    got = ctx.sql(SQL).collect().to_pydict()
    # qualifying orders: ok=1 (sum 11), ok=3 (sum 27); ok=2 (sum 1) not
    assert got == {"name": ["a", "b"], "ok": [1, 3]}


def test_anti_pushes_too():
    ctx = _ctx()
    sql = (
        "SELECT name, o.ok FROM c JOIN o ON c.ck = o.ck "
        "WHERE o.ok NOT IN (SELECT ok FROM l GROUP BY ok HAVING sum(qty) > 10) "
        "ORDER BY o.ok"
    )
    got = ctx.sql(sql).collect().to_pydict()
    assert got == {"name": ["a", "b"], "ok": [2, 4]}


def test_straddling_residual_stays_put():
    # correlated EXISTS whose residual references the CUSTOMER side too:
    # probe columns straddle both inner-join inputs -> no sink, still exact
    ctx = _ctx()
    sql = (
        "SELECT name, o.ok FROM c JOIN o ON c.ck = o.ck "
        "WHERE EXISTS (SELECT 1 FROM l WHERE l.ok = o.ok AND l.qty > c.ck) "
        "ORDER BY o.ok"
    )
    got = ctx.sql(sql).collect().to_pydict()
    # l.qty > c.ck: ck=10 needs qty>10 (none); ck=20 needs qty>20 (none)
    assert got == {"name": [], "ok": []}
