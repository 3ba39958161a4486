"""ROLLING_WINDOW extension (reference: cube_ext/rolling.rs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table


def main():
    ctx = ExecutionContext()
    ctx.register_table(
        "events",
        Table.from_pydict(
            {"day": [1, 1, 2, 4, 4, 5], "hits": [10, 5, 20, 30, 7, 8]}
        ),
    )
    df = ctx.sql(
        "SELECT day, ROLLING(SUM(hits)) AS running, "
        "ROLLING(SUM(hits) RANGE 1 PRECEDING) AS last2 "
        "FROM events ROLLING_WINDOW(DIMENSION day, FROM 1 TO 5 EVERY 1) "
        "ORDER BY day"
    )
    print(df.collect().to_pydict())


if __name__ == "__main__":
    main()
