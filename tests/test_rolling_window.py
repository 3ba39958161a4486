"""ROLLING_WINDOW SQL extension (cube_ext/rolling.rs + sql/planner.rs:695):
dense-grid rolling aggregates with PARTITION BY, RANGE offsets, and
GROUP BY DIMENSION."""

from __future__ import annotations

import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.errors import PlanError, ParserError


@pytest.fixture()
def ctx():
    c = ExecutionContext()
    c.register_table(
        "e",
        Table.from_pydict(
            {
                "day": [1, 1, 2, 4, 4, 5],
                "site": ["a", "b", "a", "a", "b", "b"],
                "hits": [10, 5, 20, 30, 7, 8],
            }
        ),
    )
    return c


def test_cumulative_rolling_sum(ctx):
    out = ctx.sql(
        "SELECT day, ROLLING(SUM(hits)) AS total FROM e "
        "ROLLING_WINDOW(DIMENSION day, FROM 1 TO 5 EVERY 1) ORDER BY day"
    ).collect()
    assert out.to_pydict() == {
        "day": [1, 2, 3, 4, 5],
        "total": [15, 35, 35, 72, 80],
    }


def test_windowed_partitioned(ctx):
    out = ctx.sql(
        "SELECT site, day, ROLLING(SUM(hits) RANGE 1 PRECEDING) AS s "
        "FROM e ROLLING_WINDOW(DIMENSION day, PARTITION BY site, "
        "FROM 1 TO 5 EVERY 1) ORDER BY site, day"
    ).collect()
    d = out.to_pydict()
    assert d["s"] == [10, 30, 20, 30, 30, 5, 5, None, 7, 15]


def test_rolling_count_and_avg(ctx):
    out = ctx.sql(
        "SELECT day, ROLLING(COUNT(hits)) AS c, ROLLING(AVG(hits)) AS a "
        "FROM e ROLLING_WINDOW(DIMENSION day, FROM 1 TO 5 EVERY 1) ORDER BY day"
    ).collect()
    d = out.to_pydict()
    assert d["c"] == [2, 3, 3, 5, 6]
    assert d["a"][0] == pytest.approx(7.5)
    assert d["a"][5 - 1] == pytest.approx(80 / 6)


def test_rolling_min_cumulative(ctx):
    out = ctx.sql(
        "SELECT day, ROLLING(MIN(hits)) AS m FROM e "
        "ROLLING_WINDOW(DIMENSION day, FROM 1 TO 5 EVERY 1) ORDER BY day"
    ).collect()
    assert out.to_pydict()["m"] == [5, 5, 5, 5, 5]


def test_grid_every_two(ctx):
    out = ctx.sql(
        "SELECT day, ROLLING(SUM(hits)) AS s FROM e "
        "ROLLING_WINDOW(DIMENSION day, FROM 1 TO 5 EVERY 2) ORDER BY day"
    ).collect()
    d = out.to_pydict()
    assert d["day"] == [1, 3, 5]
    # bucket 0 = days {1,2} (35), bucket 1 = days {3,4} (+37 -> 72),
    # bucket 2 = day 5 (+8 -> 80); cumulative
    assert d["s"] == [35, 72, 80]


def test_group_by_dimension_plain_agg(ctx):
    out = ctx.sql(
        "SELECT day, ROLLING(SUM(hits)) AS run, SUM(hits) AS per_day FROM e "
        "ROLLING_WINDOW(DIMENSION day, FROM 1 TO 5 EVERY 1, "
        "GROUP BY DIMENSION day) ORDER BY day"
    ).collect()
    d = out.to_pydict()
    assert d["run"] == [15, 35, 35, 72, 80]
    assert d["per_day"] == [15, 20, None, 37, 8]


def test_two_different_windows_not_deduped(ctx):
    """Different RANGE bounds must stay distinct aggregates (repr includes
    the frame — regression test for dedup-by-repr collapsing them)."""
    out = ctx.sql(
        "SELECT day, ROLLING(SUM(hits)) AS running, "
        "ROLLING(SUM(hits) RANGE 1 PRECEDING) AS last2 FROM e "
        "ROLLING_WINDOW(DIMENSION day, FROM 1 TO 5 EVERY 1) ORDER BY day"
    ).collect()
    d = out.to_pydict()
    assert d["running"] == [15, 35, 35, 72, 80]
    assert d["last2"] == [15, 35, 20, 37, 45]


def test_errors(ctx):
    with pytest.raises((PlanError, ParserError)):
        ctx.sql(
            "SELECT day, SUM(hits) FROM e "
            "ROLLING_WINDOW(DIMENSION day, FROM 1 TO 5 EVERY 1)"
        ).collect()  # plain agg without GROUP BY DIMENSION
    with pytest.raises((PlanError, ParserError)):
        ctx.sql(
            "SELECT day, ROLLING(SUM(hits)) FROM e "
            "ROLLING_WINDOW(DIMENSION day, FROM 5 TO 1 EVERY 1)"
        ).collect()  # TO < FROM
    with pytest.raises((PlanError, ParserError)):
        ctx.sql("SELECT ROLLING(SUM(hits)) FROM e").collect()  # no clause
