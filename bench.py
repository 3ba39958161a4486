"""Headline benchmark: TPC-H Q1 latency at SF1 on the current jax backend.

Baseline: the reference's published example run — single-node DataFusion,
TPC-H Q1 @ SF1: 1,956.11 ms/iteration
(/root/reference/benchmarks/README.md:156-161; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline > 1 means faster than the reference.
"""

import os as _os

_os.environ.setdefault(
    "DATAFUSION_TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"),
)
import json
import os
import statistics
import sys
import time

BASELINE_Q1_SF1_MS = 1956.11


def main():
    sf = float(os.environ.get("BENCH_SF", "1.0"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    import jax

    from datafusion_tpu import ExecutionContext
    from bench.q1data import generate_lineitem_q1
    from bench.tpch import get_query_sql

    ctx = ExecutionContext()
    t = generate_lineitem_q1(sf)
    ctx.register_table("lineitem", t)
    sql = get_query_sql(1)

    import numpy as np

    def sync(res):
        # ONE tiny D2H on the last-enqueued column: device streams execute
        # in order, so this proves every column's program completed.  (A
        # per-column jax.block_until_ready costs one ~30ms RPC round trip
        # PER ARRAY through the remote-TPU tunnel and would swamp the
        # measurement with harness overhead.)
        _ = np.asarray(res.columns[-1].data[:1])

    # warm-up (compiles the fused stage)
    out = ctx.sql(sql).collect()
    sync(out)
    assert out.nrows >= 1

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        res = ctx.sql(sql).collect()
        sync(res)
        times.append((time.perf_counter() - t0) * 1000)

    ms = statistics.median(times)
    print(
        json.dumps(
            {
                "metric": f"tpch_q1_sf{sf:g}_latency",
                "value": round(ms, 2),
                "unit": "ms",
                "vs_baseline": round(BASELINE_Q1_SF1_MS / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
