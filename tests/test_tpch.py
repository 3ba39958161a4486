"""TPC-H correctness: all 22 reference queries
(/root/reference/benchmarks/queries/q*.sql) vs sqlite golden answers on
deterministic generated data (reference harness: tpch.rs verify_query)."""

import pytest

from bench.tpch import check

QUERIES = list(range(1, 23))


@pytest.mark.parametrize("q", QUERIES)
def test_tpch_query(q, tpch_results):
    err = tpch_results[q]
    assert err is None, f"q{q}: {err}"


@pytest.fixture(scope="session")
def tpch_results():
    return check(0.002, QUERIES, verbose=False)
