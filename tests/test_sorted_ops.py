"""Sorted-path operators (the fork's merge family) + sort-hint rules:
MergeSortExec / SortPreservingMergeExec / MergeReSortExec (merge_sort.rs,
sort_preserving_merge.rs), SortedAggregateExec (sorted_aggregate.rs),
LastRowByUniqueKeyExec (merge_sort.rs:562), MergeJoinExec (merge_join.rs),
SortedAggregateRule / EliminateRedundantSort (compute_aggregation_strategy,
planner.rs:1667)."""

from __future__ import annotations

import pytest

from datafusion_tpu.columnar import Table
from datafusion_tpu.exprs.physical import PhysCol
from datafusion_tpu.ops.aggregate import HashAggregateExec, PhysAggExpr
from datafusion_tpu.ops.basic import MemoryExec
from datafusion_tpu.ops.sort import PhysSortExpr, SortExec
from datafusion_tpu.ops.sorted import (
    LastRowByUniqueKeyExec,
    MergeJoinExec,
    MergeReSortExec,
    MergeSortExec,
    SortedAggregateExec,
    SortPreservingMergeExec,
)
from datafusion_tpu.physical.sort_rules import (
    EliminateRedundantSort,
    SortedAggregateRule,
)
from datafusion_tpu.types.dtypes import INT64


def mem(d):
    t = Table.from_pydict(d)
    return MemoryExec(t, t.schema())


def col(t_exec, name, i=None):
    s = t_exec.schema()
    idx = s.index_of(name) if i is None else i
    return PhysCol(name, idx, s.fields[idx].dtype)


def test_merge_sort_two_runs():
    a = mem({"k": [1, 3, 5], "v": [10, 30, 50]})
    b = mem({"k": [2, 4, 6], "v": [20, 40, 60]})
    ms = MergeSortExec([a, b], [PhysSortExpr(col(a, "k"), True, False)])
    out = ms.execute()
    assert out.to_pydict() == {"k": [1, 2, 3, 4, 5, 6], "v": [10, 20, 30, 40, 50, 60]}
    assert ms.output_sort_order() == [(0, True, False)]


@pytest.mark.parametrize("cls", [SortPreservingMergeExec, MergeReSortExec])
def test_merge_variants(cls):
    a = mem({"k": [3, 1], "v": [1, 2]})
    b = mem({"k": [2, 4], "v": [3, 4]})
    out = cls([a, b], [PhysSortExpr(col(a, "k"), True, False)]).execute()
    assert out.to_pydict()["k"] == [1, 2, 3, 4]


def test_sorted_aggregate_matches_hash():
    src = {"k": [1, 1, 2, 2, 2, 5], "v": [1.0, 2.0, 3.0, 4.0, None, 6.0]}
    m = mem(src)
    group = [(col(m, "k"), "k")]
    aggs = [
        PhysAggExpr("sum", col(m, "v"), "s"),
        PhysAggExpr("count", col(m, "v"), "c"),
        PhysAggExpr("min", col(m, "v"), "mn"),
        PhysAggExpr("avg", col(m, "v"), "a"),
    ]
    sorted_out = SortedAggregateExec("single", group, aggs, m).execute()
    hash_out = HashAggregateExec("single", group, aggs, mem(src)).execute()
    sd, hd = sorted_out.to_pydict(), hash_out.to_pydict()
    # hash output is key-sorted too (sort-based grouping)
    assert sd == hd


def test_sorted_aggregate_with_nulls_in_keys():
    src = {"k": [None, None, 7, 7], "v": [1, 2, 3, 4]}
    m = mem(src)
    out = SortedAggregateExec(
        "single", [(col(m, "k"), "k")], [PhysAggExpr("sum", col(m, "v"), "s")], m
    ).execute()
    d = out.to_pydict()
    assert d["s"] == [3, 7] and d["k"] == [None, 7]


def test_last_row_by_unique_key():
    m = mem({"k": [1, 1, 2, 3, 3, 3], "v": [10, 11, 20, 30, 31, 32]})
    out = LastRowByUniqueKeyExec(m, [0]).execute()
    assert out.to_pydict() == {"k": [1, 2, 3], "v": [11, 20, 32]}


def test_merge_join_inner_and_left():
    l = mem({"k": [1, 2, 2, 4], "x": [1, 2, 3, 4]})
    r = mem({"k": [2, 4, 5], "y": [20, 40, 50]})
    on = [(col(l, "k"), col(r, "k"))]
    inner = MergeJoinExec(l, r, on, "inner").execute()
    d = inner.to_pydict()
    rows = sorted(zip(d["x"], d["y"]))
    assert rows == [(2, 20), (3, 20), (4, 40)]
    left = MergeJoinExec(l, r, on, "left").execute()
    d = left.to_pydict()
    rows = sorted(zip(d["x"], d["y"]), key=lambda p: p[0])
    assert rows == [(1, None), (2, 20), (3, 20), (4, 40)]


def test_sorted_aggregate_rule_fires():
    m = mem({"k": [2, 1, 1], "v": [1, 2, 3]})
    sort = SortExec([PhysSortExpr(col(m, "k"), True, False)], m)
    agg = HashAggregateExec(
        "single", [(col(m, "k"), "k")], [PhysAggExpr("sum", col(m, "v"), "s")], sort
    )
    out_plan = SortedAggregateRule().optimize(agg)
    assert isinstance(out_plan, SortedAggregateExec)
    assert out_plan.execute().to_pydict() == {"k": [1, 2], "s": [5, 1]}


def test_eliminate_redundant_sort():
    m = mem({"k": [2, 1], "v": [1, 2]})
    s1 = SortExec([PhysSortExpr(col(m, "k"), True, False)], m)
    s2 = SortExec([PhysSortExpr(col(m, "k"), True, False)], s1)
    out = EliminateRedundantSort().optimize(s2)
    assert isinstance(out, SortExec) and out.input is m  # inner sort kept only
    # different direction is NOT redundant
    s3 = SortExec([PhysSortExpr(col(m, "k"), False, False)], s1)
    out2 = EliminateRedundantSort().optimize(s3)
    assert isinstance(out2, SortExec) and isinstance(out2.input, SortExec)
