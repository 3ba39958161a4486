"""NYC-taxi benchmark harness.

Mirrors /root/reference/benchmarks/src/bin/nyctaxi.rs: register a tripdata
table (CSV/parquet, or synthetic when no --path is given) and time the
`fare_amt_by_passenger` aggregate
(SELECT passenger_count, MIN/MAX/SUM(fare_amount) ... GROUP BY
passenger_count — nyctaxi.rs:101).  The reference's published example run
is 7,138 ms for this query on CSV at batch 4096 (BASELINE.md).

Usage:
  python -m bench.nyctaxi [--path tripdata.csv|.parquet] [--rows 10000000]
                          [--iterations 3]
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault(
    "DATAFUSION_TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "../.jax_cache"),
)

import argparse
import time

import numpy as np

QUERIES = {
    "fare_amt_by_passenger": (
        "SELECT passenger_count, MIN(fare_amount), MAX(fare_amount), "
        "SUM(fare_amount) FROM tripdata GROUP BY passenger_count"
    ),
}


def synthetic_tripdata(rows: int):
    """Deterministic synthetic tripdata with the reference's two hot
    columns (schema: nyctaxi.rs taxi CSV)."""
    from datafusion_tpu.columnar import Table

    rng = np.random.default_rng(7)
    passenger_count = rng.integers(1, 9, rows).astype(np.int64)
    fare_amount = np.round(rng.gamma(2.5, 6.0, rows), 2)
    from datafusion_tpu.columnar.column import Column
    from datafusion_tpu.columnar.table import round_capacity
    from datafusion_tpu.types.dtypes import FLOAT64, INT64

    cap = round_capacity(rows)
    return Table(
        ["passenger_count", "fare_amount"],
        [
            Column.from_numpy(INT64, passenger_count, capacity=cap),
            Column.from_numpy(FLOAT64, fare_amount, capacity=cap),
        ],
        rows,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=None, help="tripdata csv/parquet")
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--iterations", type=int, default=3)
    args = ap.parse_args(argv)

    import jax

    from datafusion_tpu import ExecutionContext

    ctx = ExecutionContext()
    if args.path:
        if args.path.endswith(".parquet"):
            ctx.register_parquet("tripdata", args.path)
        else:
            ctx.register_csv("tripdata", args.path)
    else:
        ctx.register_table("tripdata", synthetic_tripdata(args.rows))

    for name, sql in QUERIES.items():
        # warm-up compiles the fused stage
        res = ctx.sql(sql).collect()
        _ = np.asarray(res.columns[0].data[:1])
        times = []
        for i in range(args.iterations):
            t0 = time.perf_counter()
            res = ctx.sql(sql).collect()
            _ = np.asarray(res.columns[0].data[:1])  # force D2H sync
            dt = (time.perf_counter() - t0) * 1000
            times.append(dt)
            print(f"{name} iteration {i} took {dt:.1f} ms ({res.nrows} groups)")
        print(f"{name}: best {min(times):.1f} ms over {args.iterations} iterations")


if __name__ == "__main__":
    main()
