"""Operator-level unit tests (reference: per-file #[cfg(test)] suites in
physical_plan/*, SURVEY.md §4.1)."""

import numpy as np
import pytest

from datafusion_tpu.columnar import Table
from datafusion_tpu.exprs.physical import PhysBinary, PhysCol, PhysLit
from datafusion_tpu.ops.aggregate import HashAggregateExec, PhysAggExpr
from datafusion_tpu.ops.basic import FilterExec, GlobalLimitExec, MemoryExec, SkipExec
from datafusion_tpu.ops.join import CrossJoinExec, HashJoinExec
from datafusion_tpu.ops.sort import PhysSortExpr, SortExec
from datafusion_tpu.types import ScalarValue
from datafusion_tpu.types.dtypes import BOOL, FLOAT64, INT64, STRING


def mem(d, dtypes=None):
    t = Table.from_pydict(d, dtypes)
    return MemoryExec(t, t.schema()), t


def col(t, name):
    i = t.names.index(name)
    return PhysCol(name, i, t.columns[i].dtype)


def test_filter_compacts_rows():
    m, t = mem({"a": list(range(100)), "b": [float(i) for i in range(100)]})
    pred = PhysBinary(col(t, "a"), ">=", PhysLit(ScalarValue.int64(95)), BOOL)
    out = FilterExec(pred, m).execute()
    assert out.nrows == 5
    assert out.to_pydict()["a"] == [95, 96, 97, 98, 99]


def test_sort_stability():
    m, t = mem({"a": [2, 1, 2, 1], "tag": ["w", "x", "y", "z"]})
    out = SortExec([PhysSortExpr(col(t, "a"))], m).execute()
    # stable: ties keep input order
    assert out.to_pydict()["tag"] == ["x", "z", "w", "y"]


def test_topk_fetch():
    m, t = mem({"a": [5, 3, 9, 1]})
    out = SortExec([PhysSortExpr(col(t, "a"), False)], m, fetch=2).execute()
    assert out.to_pydict()["a"] == [9, 5]


def test_two_phase_agg_matches_single_phase():
    data = {
        "g": [f"g{i % 7}" for i in range(500)],
        "v": [float(i % 13) for i in range(500)],
    }
    m1, t = mem(data)
    aggs = lambda: [
        PhysAggExpr("count", None, "c"),
        PhysAggExpr("sum", col(t, "v"), "s"),
        PhysAggExpr("avg", col(t, "v"), "a"),
        PhysAggExpr("min", col(t, "v"), "lo"),
        PhysAggExpr("max", col(t, "v"), "hi"),
        PhysAggExpr("var_samp", col(t, "v"), "var"),
    ]
    single = HashAggregateExec("single", [(col(t, "g"), "g")], aggs(), m1)
    m2, _ = mem(data)
    partial = HashAggregateExec("partial", [(col(t, "g"), "g")], aggs(), m2)
    # rebind state columns for the final phase
    final = HashAggregateExec(
        "final",
        [(PhysCol("g", 0, STRING), "g")],
        aggs(),
        partial,
    )
    a = single.execute().to_pydict()
    b = final.execute().to_pydict()
    assert a["c"] == b["c"] and a["s"] == b["s"]
    assert np.allclose(a["a"], b["a"]) and np.allclose(a["var"], b["var"])


def test_join_types():
    lm, lt = mem({"k": [1, 2, 3, None], "lv": ["a", "b", "c", "d"]})
    rm, rt = mem({"k2": [2, 3, 3, 5], "rv": [20, 30, 31, 50]})
    on = [(col(lt, "k"), col(rt, "k2"))]

    inner = HashJoinExec(lm, rm, on, "inner").execute().to_pydict()
    assert sorted(zip(inner["lv"], inner["rv"])) == [("b", 20), ("c", 30), ("c", 31)]

    left = HashJoinExec(lm, rm, on, "left").execute()
    assert left.nrows == 5  # 3 matches + 'a' + null-key row

    right = HashJoinExec(lm, rm, on, "right").execute().to_pydict()
    assert sorted(v for v in right["rv"]) == [20, 30, 31, 50]

    full = HashJoinExec(lm, rm, on, "full").execute()
    assert full.nrows == 6

    semi = HashJoinExec(lm, rm, on, "semi").execute().to_pydict()
    assert sorted(semi["lv"]) == ["b", "c"]

    anti = HashJoinExec(lm, rm, on, "anti").execute().to_pydict()
    assert sorted(anti["lv"]) == ["a", "d"]


def test_join_residual_filter():
    lm, lt = mem({"k": [1, 1, 2], "lv": [10, 20, 30]})
    rm, rt = mem({"k2": [1, 1, 2], "rv": [15, 25, 100]})
    filt = PhysBinary(
        PhysCol("lv", 1, INT64), "<", PhysCol("rv", 3, INT64), BOOL
    )
    out = HashJoinExec(lm, rm, [(col(lt, "k"), col(rt, "k2"))], "inner", filt).execute()
    rows = sorted(zip(out.to_pydict()["lv"], out.to_pydict()["rv"]))
    assert rows == [(10, 15), (10, 25), (20, 25), (30, 100)]


def test_cross_join():
    lm, _ = mem({"a": [1, 2]})
    rm, _ = mem({"b": ["x", "y", "z"]})
    out = CrossJoinExec(lm, rm).execute()
    assert out.nrows == 6


def test_limit_skip():
    m, _ = mem({"a": list(range(10))})
    out = SkipExec(3, GlobalLimitExec(7, m)).execute()
    assert out.to_pydict()["a"] == [3, 4, 5, 6]


def test_duplicate_heavy_join():
    n = 1000
    lm, lt = mem({"k": [i % 3 for i in range(n)]})
    rm, rt = mem({"k2": [0, 0, 1]})
    out = HashJoinExec(lm, rm, [(col(lt, "k"), col(rt, "k2"))], "inner").execute()
    # k=0 rows match twice, k=1 rows once
    expected = 334 * 2 + 333
    assert out.nrows == expected
