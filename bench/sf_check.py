"""Large-SF validation: morsel-streamed single-chip TPC-H vs the pandas
golden (the external-answers check of tpch.rs:1008-1070 at a scale where
sqlite is too slow).

Usage:
  python -m bench.sf_check --sf 10 --queries 1,6,18 \
      --host-tables lineitem,orders [--iters 2]

Big tables stay HOST-resident and stream morsels through the engine
(out-of-HBM path); every query's rows are compared against the
hand-written pandas golden programs.  Writes bench/SFCHECK_SF{sf}.json
with per-query wall-clock (cold + warm) and the match verdict.
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault(
    "DATAFUSION_TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
)
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover
        pass

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=10.0)
    ap.add_argument("--queries", type=str, default="1,6,18")
    ap.add_argument("--host-tables", type=str, default="lineitem,orders")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--skip-golden", action="store_true",
                    help="record wall-clocks only (golden already verified)")
    args = ap.parse_args()
    queries = [int(x) for x in args.queries.split(",") if x]
    host_tables = tuple(x for x in args.host_tables.split(",") if x)

    import jax
    import numpy as np

    from datafusion_tpu import ExecutionContext

    from .golden import compare_results, table_to_rows
    from .tpch import FULLY_ORDERED, ORDER_SPECS, load_engine_tables, run_query
    from .tpch_datagen import generate_tpch

    print(f"datagen sf={args.sf} ...", flush=True)
    t0 = time.perf_counter()
    data = generate_tpch(args.sf)
    print(f"datagen done in {time.perf_counter()-t0:.1f}s", flush=True)

    ctx = ExecutionContext()
    load_engine_tables(ctx, data, host_tables=host_tables)

    out = {
        "sf": args.sf,
        "backend": jax.devices()[0].platform,
        "host_tables": list(host_tables),
        "queries": {},
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"SFCHECK_SF{args.sf:g}.json",
    )
    # resume: keep an existing same-backend record's queries (a run cut
    # off by a timeout, or adding queries to a prior record)
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
            if (
                prev.get("backend") == out["backend"]
                and prev.get("sf") == args.sf
            ):
                out["queries"].update(prev.get("queries", {}))
        except Exception:
            pass
    for q in queries:
        rec = {}
        t0 = time.perf_counter()
        t = run_query(ctx, q)
        _ = np.asarray(t.columns[-1].data[:1])  # drain the device stream
        rec["cold_ms"] = round((time.perf_counter() - t0) * 1000, 1)
        warms = []
        for _i in range(max(args.iters - 1, 1)):
            t0 = time.perf_counter()
            t = run_query(ctx, q)
            _ = np.asarray(t.columns[-1].data[:1])
            warms.append((time.perf_counter() - t0) * 1000)
        rec["warm_ms"] = round(min(warms), 1)
        rec["rows"] = t.nrows
        if not args.skip_golden:
            from .golden_pandas import pandas_query

            t0 = time.perf_counter()
            golden = pandas_query(data, q)
            rec["golden_ms"] = round((time.perf_counter() - t0) * 1000, 1)
            err = compare_results(
                table_to_rows(t), golden, ordered=(q in FULLY_ORDERED),
                order_spec=ORDER_SPECS.get(q),
            )
            rec["match"] = err is None
            if err:
                rec["error"] = err
        out["queries"][str(q)] = rec
        print(f"q{q}: {rec}", flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
