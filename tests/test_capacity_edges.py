"""Property tests for static-capacity edges (VERDICT r1 next-step #8).

Every buffer in the engine has a power-of-two capacity >= 4096 with live
rows front-compacted; the failure modes unique to this design are
exactly-full buffers (n == capacity, no dead tail), speculation
overflow -> exact rerun, shrink-after-join right-sizing, and dictionary
growth across inputs.  The reference has no analogue (dynamic Vec
batches); these pin the TPU-native contracts instead.
"""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table


def _ctx(**tables):
    ctx = ExecutionContext()
    for name, data in tables.items():
        ctx.register_table(name, Table.from_pydict(data))
    return ctx


@pytest.mark.parametrize("n", [4096, 8192])
def test_exactly_full_buffer_grouped_aggregates(n):
    """n == round_capacity(n): no dead tail after the group sort.  The
    last group's aggregate must still cover every row (ADVICE r1 high #1
    regression: last_pos derived from garbage for exactly-full buffers)."""
    rng = np.random.default_rng(7)
    g = rng.integers(0, 5, n)
    v = rng.normal(size=n)
    ctx = _ctx(t={"g": g, "v": v})
    got = ctx.sql(
        "SELECT g, count(*) c, sum(v) s, min(v) mn, max(v) mx FROM t GROUP BY g ORDER BY g"
    ).collect().to_pydict()
    for i, gv in enumerate(got["g"]):
        m = g == gv
        assert got["c"][i] == int(m.sum())
        assert got["s"][i] == pytest.approx(float(v[m].sum()))
        assert got["mn"][i] == pytest.approx(float(v[m].min()))
        assert got["mx"][i] == pytest.approx(float(v[m].max()))


def test_exactly_full_buffer_filter_keeps_all():
    n = 4096
    ctx = _ctx(t={"a": np.arange(n)})
    got = ctx.sql("SELECT count(*) c, sum(a) s FROM t WHERE a >= 0").collect().to_pydict()
    assert got["c"] == [n] and got["s"] == [n * (n - 1) // 2]


def test_speculation_overflow_falls_back_exact():
    """A fan-out join whose candidate total exceeds probe capacity must
    overflow the speculation window and re-run exactly — same rows as the
    no-speculation run."""
    n = 5000  # cap 8192; fanout 4x overflows probe capacity (20k pairs)
    probe = {"k": np.arange(n) % 100, "pv": np.arange(n)}
    build = {"k2": np.repeat(np.arange(100), 4), "bv": np.arange(400)}
    ctx = _ctx(t=probe, u=build)
    sql = "SELECT count(*) c, sum(pv) s, sum(bv) b FROM t JOIN u ON k = k2"
    got = ctx.sql(sql).collect().to_pydict()
    import os

    os.environ["DATAFUSION_TPU_NO_SPECULATIVE_JOINS"] = "1"
    try:
        # fresh thread-local state is picked up lazily; force a new window
        from datafusion_tpu.ops import kernels as K

        K.SPECULATION.enabled = False
        exact = _ctx(t=probe, u=build).sql(sql).collect().to_pydict()
    finally:
        del os.environ["DATAFUSION_TPU_NO_SPECULATIVE_JOINS"]
        K.SPECULATION.enabled = True
    assert got == exact
    assert got["c"] == [n * 4]


def test_join_shrink_right_sizes_tiny_survivors():
    """A selective filter above a large table leaves a near-empty buffer at
    large capacity; the join-input shrink must right-size it (and the
    tiny-build path must produce exact semi/anti rows)."""
    n = 200_000
    rng = np.random.default_rng(3)
    big = {"k": rng.integers(0, 1000, n), "v": rng.normal(size=n)}
    ctx = _ctx(t=big, f={"k2": np.arange(1000), "w": rng.normal(size=1000)})
    # subquery keeps 3 keys -> tiny build
    sql = (
        "SELECT count(*) c FROM t WHERE k IN "
        "(SELECT k2 FROM f WHERE w > 2.8)"
    )
    got = ctx.sql(sql).collect().to_pydict()["c"][0]
    import pandas as pd

    fdf = pd.DataFrame(ctx.table("f").collect().to_pydict())
    keys = set(fdf[fdf.w > 2.8].k2)
    expect = int(np.isin(big["k"], list(keys)).sum())
    assert got == expect

    sql_anti = (
        "SELECT count(*) c FROM t WHERE k NOT IN "
        "(SELECT k2 FROM f WHERE w > 2.8)"
    )
    got_anti = ctx.sql(sql_anti).collect().to_pydict()["c"][0]
    assert got_anti == n - expect


def test_dictionary_growth_union_and_join():
    """String dictionaries merge across inputs: a union/join between
    tables with disjoint dictionaries must keep exact string semantics."""
    a = {"s": [f"a{i:03d}" for i in range(500)], "v": list(range(500))}
    b = {"s": [f"b{i:03d}" for i in range(500)], "v": list(range(500))}
    ctx = _ctx(x=a, y=b)
    got = ctx.sql(
        "SELECT count(distinct s) c FROM (SELECT s FROM x UNION ALL SELECT s FROM y)"
    ).collect().to_pydict()
    assert got["c"] == [1000]
    j = ctx.sql(
        "SELECT count(*) c FROM x JOIN y ON x.s = y.s"
    ).collect().to_pydict()
    assert j["c"] == [0]


def test_tiny_build_null_keys_never_match():
    """SQL equi-join semantics on the direct-compare tiny path: NULL keys
    match nothing for semi, and anti keeps the NULL-key probe rows (same
    contract as the sort-merge path's verify)."""
    probe = Table.from_pydict(
        {"k": [1, 2, None, 4, None], "v": [10, 20, 30, 40, 50]}
    )
    build = Table.from_pydict({"k2": [2, None]})
    ctx = ExecutionContext()
    ctx.register_table("t", probe)
    ctx.register_table("u", build)
    from datafusion_tpu.ops.join import join_tables
    from datafusion_tpu.exprs.physical import PhysCol

    lt = ctx.table("t").collect()
    rt = ctx.table("u").collect()
    on = [
        (
            PhysCol("k", 0, lt.columns[0].dtype),
            PhysCol("k2", 0, rt.columns[0].dtype),
        )
    ]
    semi = join_tables(lt, rt, on, "semi", None)
    assert semi.to_pydict()["v"] == [20]
    anti = join_tables(lt, rt, on, "anti", None)
    assert sorted(anti.to_pydict()["v"]) == [10, 30, 40, 50]
