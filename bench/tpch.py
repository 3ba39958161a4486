"""TPC-H harness: run queries 1-22 on the engine, verify vs sqlite golden
answers, and time them.

Mirrors the reference's tpch binary (/root/reference/benchmarks/src/bin/
tpch.rs: benchmark_datafusion :205, verify_query :1008).

Usage:
  python -m bench.tpch --check [--sf 0.01] [--queries 1,6]   # verify
  python -m bench.tpch --bench [--sf 1] [--queries 1]        # time
  (add JAX_PLATFORMS config: runs on whatever backend jax selects)
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault(
    "DATAFUSION_TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "../.jax_cache"),
)

import argparse
import sys
import time

import numpy as np


def get_query_sql(q: int) -> str:
    with open(f"/root/reference/benchmarks/queries/q{q}.sql") as f:
        return f.read()


# queries whose ORDER BY fully determines row order (compare ordered);
# everything else compares as sorted multisets
FULLY_ORDERED = {1, 3, 5, 6, 12, 14, 17, 19}
# (output col, desc) ORDER BY specs for the ordered queries: q3/q5 sort by
# a float revenue that TIES at SF>=10, so row order among tied rows is
# engine-defined — golden comparison = multiset equality + the engine's
# own ordering contract (bench/golden.py compare_results order_spec)
ORDER_SPECS = {
    1: [(0, False), (1, False)],
    3: [(1, True), (2, False)],
    5: [(1, True)],
    6: [],
    12: [(0, False)],
    14: [],
    17: [],
    19: [],
}


def _host_table(cols: dict, dtypes: dict):
    """Datagen numpy columns -> HostTable with NO device transfer: the
    out-of-HBM registration path for SF >= 10 benches (SURVEY.md par.7 hard
    part g; the reference streams scans from disk, parquet.rs:596-636)."""
    from datafusion_tpu.columnar.dictionary import StringDict
    from datafusion_tpu.datasource.host import HostTable
    from datafusion_tpu.types.dtypes import FLOAT64, INT64, STRING

    names, dts, datas, valids, dicts = [], [], [], [], []
    nrows = 0
    for name, arr in cols.items():
        arr = np.asarray(arr)
        nrows = len(arr)
        names.append(name)
        if arr.dtype == object:
            d, codes, valid = StringDict.from_strings_masked(arr)
            dts.append(STRING)
            datas.append(codes)
            valids.append(valid)
            dicts.append(d)
            continue
        dt = dtypes.get(name) or (
            FLOAT64 if np.issubdtype(arr.dtype, np.floating) else INT64
        )
        if dt.is_decimal:
            data = np.round(arr * 10**dt.scale).astype(np.int64)
        else:
            data = arr.astype(dt.storage_np_dtype(), copy=False)
        dts.append(dt)
        datas.append(data)
        valids.append(np.ones(nrows, dtype=bool))
        dicts.append(None)
    return HostTable(names, dts, datas, valids, dicts, nrows)


def load_engine_tables(ctx, data, host_tables=()):
    """Register datagen tables; names in ``host_tables`` stay host-resident
    and stream through the morsel path instead of living whole in HBM."""
    from datafusion_tpu.columnar.table import Table
    from datafusion_tpu.types.dtypes import DATE32, decimal

    from .tpch_datagen import DATE_COLUMNS, DECIMAL_COLUMNS

    for tname, cols in data.items():
        dtypes = {}
        for n in cols:
            if n in DATE_COLUMNS:
                dtypes[n] = DATE32
            elif n in DECIMAL_COLUMNS:
                dtypes[n] = decimal(15, 2)
        if tname in host_tables:
            ctx.register_host_table(tname, _host_table(cols, dtypes))
        else:
            t = Table.from_pydict(cols, dtypes=dtypes)
            ctx.register_table(tname, t)


def run_query(ctx, q: int, mesh=None):
    """Execute query q (handles q15's 3-statement form). Returns Table.
    With ``mesh``, queries run SPMD over the device mesh."""
    from datafusion_tpu.sql.parser import parse_sql

    sql = get_query_sql(q)
    stmts = sql.split(";")
    stmts = [s for s in stmts if s.strip()]
    result = None
    for s in stmts:
        low = s.lower()
        if "create view" in low or "drop view" in low:
            ctx.sql(s)
        else:
            result = ctx.sql(s).collect(mesh=mesh)
    return result


# sqlite can't parse derived-table column aliases `as t (c1, c2)` (q13)
SQLITE_OVERRIDES = {
    13: """
select c_count, count(*) as custdist
from (
    select c_custkey as c_custkey, count(o_orderkey) as c_count
    from customer left outer join orders on
        c_custkey = o_custkey and o_comment not like '%special%requests%'
    group by c_custkey
) as c_orders
group by c_count
order by custdist desc, c_count desc
""",
}


def golden_query(conn, q: int):
    from .golden import run_golden, to_sqlite_sql

    if q in SQLITE_OVERRIDES:
        return run_golden(conn, SQLITE_OVERRIDES[q])
    sql = get_query_sql(q)
    stmts = [s for s in sql.split(";") if s.strip()]
    rows = None
    for s in stmts:
        low = s.lower()
        if "create view" in low:
            conn.execute(to_sqlite_sql(s))
        elif "drop view" in low:
            conn.execute(to_sqlite_sql(s))
        else:
            rows = run_golden(conn, s)
    return rows


def check(sf: float, queries: list[int], verbose: bool = True, mesh=None,
          host_tables=()) -> dict:
    import jax

    from datafusion_tpu import ExecutionContext

    from .golden import compare_results, load_sqlite, table_to_rows
    from .tpch_datagen import generate_tpch

    data = generate_tpch(sf)
    ctx = ExecutionContext()
    load_engine_tables(ctx, data, host_tables=host_tables)
    conn = load_sqlite(data)

    results = {}
    for q in queries:
        try:
            t = run_query(ctx, q, mesh=mesh)
            engine_rows = table_to_rows(t)
            golden_rows = golden_query(conn, q)
            err = compare_results(
                engine_rows, golden_rows, ordered=(q in FULLY_ORDERED),
                order_spec=ORDER_SPECS.get(q),
            )
            results[q] = err
            if verbose:
                status = "OK " if err is None else "FAIL"
                print(f"q{q:<3} {status} ({len(engine_rows)} rows)"
                      + (f"  {err}" if err else ""))
        except Exception as e:
            results[q] = f"{type(e).__name__}: {e}"
            if verbose:
                print(f"q{q:<3} ERROR {type(e).__name__}: {str(e)[:200]}")
    return results


def bench(
    sf: float, queries: list[int], iterations: int = 3, host_tables=()
) -> dict:
    from datafusion_tpu import ExecutionContext

    from .tpch_datagen import generate_tpch

    data = generate_tpch(sf)
    ctx = ExecutionContext()
    load_engine_tables(ctx, data, host_tables=host_tables)
    timings = {}
    on_query_done = getattr(bench, "on_query_done", None)
    import gc

    # steady state starts at iteration 3: iteration 1 pays XLA-cache loads
    # + tracing + capacity learning, iteration 2 builds the learned-shape
    # (whole-query) programs.  Warm-ups run but are NOT recorded, so the
    # reported median is a steady-state median (BASELINE.md methodology;
    # the r4 records mixed warm-up iterations into 3-iter medians).
    warmups = int(_os.environ.get("BENCH_WARMUP", "2"))
    for q in queries:
        times = []
        for i in range(warmups + iterations):
            gc.collect()  # drop prior intermediates' device buffers (HBM)
            t0 = time.perf_counter()
            t = run_query(ctx, q)
            # one tiny D2H on the last column: in-order device streams make
            # this the completion barrier for the whole query (per-array
            # block_until_ready costs an RPC round trip per column)
            if t is not None and t.num_columns:
                np.asarray(t.columns[-1].data[:1])
            dt = time.perf_counter() - t0
            if i >= warmups:
                times.append(dt)
        timings[q] = times
        print(f"q{q}: " + ", ".join(f"{x*1000:.1f}ms" for x in times))
        if on_query_done is not None:
            on_query_done(q, times)
    return timings


def convert(src_dir: str, dst_dir: str, fmt: str):
    """dbgen `.tbl` files -> csv or parquet (the reference tpch binary's
    `convert` subcommand, tpch.rs `main`)."""
    import os

    from .tpch_datagen import generate_tpch

    # column order per table (tiny generation defines the schema)
    table_columns = {t: list(c) for t, c in generate_tpch(0.001).items()}
    os.makedirs(dst_dir, exist_ok=True)
    from datafusion_tpu import ExecutionContext
    from datafusion_tpu.columnar.table import Table

    ctx = ExecutionContext()
    for tname, cols in table_columns.items():
        path = os.path.join(src_dir, f"{tname}.tbl")
        if not os.path.exists(path):
            continue
        import pandas as pd

        df = pd.read_csv(path, sep="|", names=cols + ["_trail"], index_col=False)
        df = df[cols]
        t = Table.from_pandas(df)
        ctx.register_table(tname, t)
        out = os.path.join(dst_dir, f"{tname}.{ 'parquet' if fmt == 'parquet' else 'csv'}")
        dfr = ctx.table(tname)
        if fmt == "parquet":
            ctx.write_parquet(dfr, out)
        else:
            ctx.write_csv(dfr, out)
        print(f"{tname}: {t.nrows} rows -> {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--convert", action="store_true", help="dbgen .tbl -> csv/parquet")
    ap.add_argument("--src", type=str, default=".", help="--convert: .tbl directory")
    ap.add_argument("--dst", type=str, default="./converted", help="--convert: output dir")
    ap.add_argument("--format", type=str, default="parquet", choices=["csv", "parquet"])
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--queries", type=str, default=",".join(map(str, range(1, 23))))
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.convert:
        convert(args.src, args.dst, args.format)
        return
    queries = [int(x) for x in args.queries.split(",")]
    if args.check:
        results = check(args.sf, queries)
        bad = {q: e for q, e in results.items() if e is not None}
        print(f"\n{len(queries) - len(bad)}/{len(queries)} queries match golden answers")
        sys.exit(1 if bad else 0)
    if args.bench:
        bench(args.sf, queries, args.iterations)


if __name__ == "__main__":
    main()
