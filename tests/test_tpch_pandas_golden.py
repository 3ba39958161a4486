"""TPC-H vs the SECOND golden engine (hand-written pandas programs,
bench/golden_pandas.py) — independent of sqlite, so a semantic divergence
shared by engine+sqlite (decimal division, NULL ordering, LIKE case
rules) can't hide a bug.  Mirrors the reference's external-answers check
(/root/reference/benchmarks/src/bin/tpch.rs:1008-1070)."""

import pytest

from bench.golden import compare_results, table_to_rows
from bench.golden_pandas import pandas_query
from bench.tpch import FULLY_ORDERED, ORDER_SPECS, load_engine_tables, run_query

QUERIES = list(range(1, 23))


@pytest.fixture(scope="module")
def setup():
    from bench.tpch_datagen import generate_tpch
    from datafusion_tpu import ExecutionContext

    data = generate_tpch(0.01)
    ctx = ExecutionContext()
    load_engine_tables(ctx, data)
    return ctx, data


@pytest.mark.parametrize("q", QUERIES)
def test_engine_matches_pandas(q, setup):
    ctx, data = setup
    engine_rows = table_to_rows(run_query(ctx, q))
    golden = pandas_query(data, q)
    err = compare_results(engine_rows, golden, ordered=(q in FULLY_ORDERED), order_spec=ORDER_SPECS.get(q))
    assert err is None, f"q{q}: {err}"
