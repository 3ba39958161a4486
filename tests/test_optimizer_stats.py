"""AggregateStatistics, HashBuildProbeOrder, and parquet row-group pruning
(reference: optimizer/aggregate_statistics.rs, hash_build_probe_order.rs,
physical_optimizer/pruning.rs + tests/parquet_pruning.rs)."""

from __future__ import annotations

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.logical import plan as L


def _optimized(ctx, sql):
    return ctx.optimize(ctx.create_logical_plan(sql))


def test_count_star_from_statistics():
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"a": list(range(100))}))
    plan = _optimized(ctx, "SELECT count(*) FROM t")
    # rewritten: no TableScan (and thus no Aggregate) remains
    def has_scan(p):
        if isinstance(p, L.TableScan):
            return True
        return any(has_scan(i) for i in p.inputs())

    assert not has_scan(plan)
    out = ctx.sql("SELECT count(*) FROM t").collect()
    assert out.to_pydict() == {"COUNT(*)": [100]}


def test_count_star_with_filter_not_rewritten():
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"a": list(range(100))}))
    out = ctx.sql("SELECT count(*) FROM t WHERE a < 10").collect()
    assert list(out.to_pydict().values()) == [[10]]


def test_build_probe_order_swaps_smaller_left():
    ctx = ExecutionContext()
    ctx.register_table("small", Table.from_pydict({"k": [1, 2, 3], "x": [1, 2, 3]}))
    ctx.register_table(
        "big", Table.from_pydict({"k": list(range(100)), "y": list(range(100))})
    )
    plan = _optimized(
        ctx, "SELECT small.x, big.y FROM small JOIN big ON small.k = big.k"
    )

    def find_join(p):
        if isinstance(p, L.Join):
            return p
        for i in p.inputs():
            j = find_join(i)
            if j is not None:
                return j
        return None

    j = find_join(plan)
    assert j is not None
    # build side (right) must be the smaller table after the rule
    def scans(p):
        if isinstance(p, L.TableScan):
            yield p.table_name
        for i in p.inputs():
            yield from scans(i)

    assert "small" in list(scans(j.right))
    # result columns stay in the original order and values correct
    out = ctx.sql(
        "SELECT small.x, big.y FROM small JOIN big ON small.k = big.k ORDER BY small.x"
    ).collect()
    assert out.to_pydict() == {"x": [1, 2, 3], "y": [1, 2, 3]}


def test_min_max_from_parquet_stats(tmp_path):
    """MIN/MAX over an unfiltered parquet scan folds to footer statistics
    (aggregate_statistics.rs MIN/MAX path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = tmp_path / "t.parquet"
    pq.write_table(
        pa.table({"a": [5, 1, 9, 3], "s": ["m", "a", "z", "k"]}), p, row_group_size=2
    )
    ctx = ExecutionContext()
    ctx.register_parquet("t", str(p))
    plan = _optimized(ctx, "SELECT min(a), max(a), max(s) FROM t")

    def has_scan(pl):
        if isinstance(pl, L.TableScan):
            return True
        return any(has_scan(i) for i in pl.inputs())

    assert not has_scan(plan)  # folded to constants, no scan
    out = ctx.sql("SELECT min(a) AS mn, max(a) AS mx, max(s) AS ms FROM t").collect()
    assert out.to_pydict() == {"mn": [1], "mx": [9], "ms": ["z"]}
    # with a filter the fold must NOT fire
    out2 = ctx.sql("SELECT min(a) AS mn FROM t WHERE a > 3").collect()
    assert out2.to_pydict() == {"mn": [5]}


# ---------------------------------------------------------------------------
# pruning
# ---------------------------------------------------------------------------


@pytest.fixture()
def parquet_file(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # 4 row groups of 100 rows with disjoint ranges of `a`
    tbl = pa.table(
        {
            "a": list(range(400)),
            "s": [f"v{i//100}" for i in range(400)],
        }
    )
    p = tmp_path / "t.parquet"
    pq.write_table(tbl, p, row_group_size=100)
    return str(p)


def test_parquet_row_group_pruning(parquet_file):
    ctx = ExecutionContext()
    ctx.register_parquet("t", parquet_file)
    out = ctx.sql("SELECT count(*) AS c FROM t WHERE a >= 350").collect()
    assert out.to_pydict() == {"c": [50]}
    # direct check through the pruning API
    prov = ctx._resolve_table("t")
    from datafusion_tpu.logical.expr import BinaryExpr, Column, Literal
    from datafusion_tpu.types import ScalarValue

    f = BinaryExpr(Column("a"), ">=", Literal(ScalarValue.int64(350)))
    stats, groups = prov._row_group_stats()
    from datafusion_tpu.physical.pruning import PruningPredicate

    keep = PruningPredicate([f]).prune(stats)
    assert keep.tolist() == [False, False, False, True]


def test_pruning_string_and_inlist(parquet_file):
    from datafusion_tpu.logical.expr import BinaryExpr, Column, InList, Literal
    from datafusion_tpu.physical.pruning import PruningPredicate
    from datafusion_tpu.types import ScalarValue

    ctx = ExecutionContext()
    ctx.register_parquet("t", parquet_file)
    prov = ctx._resolve_table("t")
    stats, _ = prov._row_group_stats()

    eq = BinaryExpr(Column("s"), "=", Literal(ScalarValue.utf8("v2")))
    assert PruningPredicate([eq]).prune(stats).tolist() == [False, False, True, False]

    il = InList(
        Column("a"),
        [Literal(ScalarValue.int64(5)), Literal(ScalarValue.int64(305))],
        False,
    )
    assert PruningPredicate([il]).prune(stats).tolist() == [True, False, False, True]


def test_pruning_unknown_stats_keeps_all():
    from datafusion_tpu.logical.expr import BinaryExpr, Column, Literal
    from datafusion_tpu.physical.pruning import ContainerStats, PruningPredicate
    from datafusion_tpu.types import ScalarValue

    stats = ContainerStats(3)  # no column stats at all
    f = BinaryExpr(Column("a"), "<", Literal(ScalarValue.int64(0)))
    assert PruningPredicate([f]).prune(stats).tolist() == [True, True, True]


def test_pruning_extended_operators(parquet_file):
    """!=, NOT-pushdown, LIKE-prefix, NOT BETWEEN, NOT IN, IS NOT NULL over
    all-null groups (pruning.rs NotEq/StartsWith/negation rewrites)."""
    from datafusion_tpu.logical.expr import (
        Between,
        BinaryExpr,
        Column,
        InList,
        IsNotNull,
        Literal,
        Not,
    )
    from datafusion_tpu.physical.pruning import ContainerStats, PruningPredicate
    from datafusion_tpu.types import ScalarValue

    ctx = ExecutionContext()
    ctx.register_parquet("t", parquet_file)
    stats, _ = ctx._resolve_table("t")._row_group_stats()

    # LIKE 'v2%' can only match the third group (s = 'v0'..'v3' per group)
    like = BinaryExpr(Column("s"), "like", Literal(ScalarValue.utf8("v2%")))
    assert PruningPredicate([like]).prune(stats).tolist() == [False, False, True, False]
    # leading wildcard: no prefix, keeps everything
    like2 = BinaryExpr(Column("s"), "like", Literal(ScalarValue.utf8("%2")))
    assert PruningPredicate([like2]).prune(stats).all()

    # != over single-valued groups (s is constant per group)
    ne = BinaryExpr(Column("s"), "!=", Literal(ScalarValue.utf8("v1")))
    assert PruningPredicate([ne]).prune(stats).tolist() == [True, False, True, True]
    # NOT (s = 'v1') behaves the same
    not_eq = Not(BinaryExpr(Column("s"), "=", Literal(ScalarValue.utf8("v1"))))
    assert PruningPredicate([not_eq]).prune(stats).tolist() == [True, False, True, True]

    # NOT BETWEEN 100 AND 399 keeps only the first group
    nb = Between(Column("a"), True, Literal(ScalarValue.int64(100)), Literal(ScalarValue.int64(399)))
    assert PruningPredicate([nb]).prune(stats).tolist() == [True, False, False, False]

    # NOT IN ('v0','v3') prunes the single-valued groups holding them
    ni = InList(
        Column("s"),
        [Literal(ScalarValue.utf8("v0")), Literal(ScalarValue.utf8("v3"))],
        True,
    )
    assert PruningPredicate([ni]).prune(stats).tolist() == [False, True, True, False]

    # IS NOT NULL prunes an all-null container (synthetic stats)
    cs = ContainerStats(2)
    cs.num_rows = __import__("numpy").asarray([10, 10], dtype=object)
    cs.set_column("x", [None, 1], [None, 5], [10, 0], [True, True])
    assert PruningPredicate([IsNotNull(Column("x"))]).prune(cs).tolist() == [False, True]
