"""Whole-query fusion coverage probe: run each TPC-H query several times
and report whether the warm runs execute as ONE whole-query XLA program
(physical/query_compiler.py), and verify warm results against the cold
(node-by-node) run.

Usage: python -m bench.wq_coverage [sf] [iters]
"""

from __future__ import annotations

import sys
import time

import jax

if __import__("os").environ.get("JAX_PLATFORMS"):
    # re-assert the launcher's backend over the axon site hook (which
    # forces 'axon,cpu' and can fail outright when the TPU is busy)
    try:
        jax.config.update("jax_platforms", __import__("os").environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover
        pass


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from datafusion_tpu import ExecutionContext
    from bench.tpch import get_query_sql, load_engine_tables, run_query
    from bench.tpch_datagen import generate_tpch
    from bench.golden import table_to_rows

    data = generate_tpch(sf)
    ctx = ExecutionContext()
    load_engine_tables(ctx, data)

    fused, fell_back = [], []
    for q in range(1, 23):
        sql = get_query_sql(q)
        try:
            t0 = time.perf_counter()
            cold = table_to_rows(run_query(ctx, q))
            t_cold = time.perf_counter() - t0
            warm_rows = None
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                warm_rows = table_to_rows(run_query(ctx, q))
                times.append(time.perf_counter() - t0)
            phys = None
            for (disp, _v), p in ctx._plan_cache.items():
                if p is not None and getattr(p, "_whole_query", None) is not None:
                    wq = p._whole_query
                    if wq._fn is not None or wq._attempts:
                        phys = p
            # the LAST cached plan is this query's
            key = list(ctx._plan_cache)[-1]
            wq = getattr(ctx._plan_cache[key], "_whole_query", None)
            ok = sorted(map(repr, warm_rows)) == sorted(map(repr, cold))
            state = (
                "FUSED"
                if wq is not None and wq._fn is not None
                else f"fallback(attempts={getattr(wq, '_attempts', '?')},dead={getattr(wq, '_dead', '?')})"
            )
            (fused if "FUSED" in state else fell_back).append(q)
            print(
                f"q{q:<3} {state:<32} cold {t_cold*1000:8.1f} ms  "
                f"warm {min(times)*1000:8.1f} ms  rows_match={ok}"
            )
            if not ok:
                print(f"  !! q{q} WARM RESULTS DIFFER FROM COLD")
        except Exception as e:
            fell_back.append(q)
            print(f"q{q:<3} ERROR {type(e).__name__}: {str(e)[:160]}")
    print(f"\nfused {len(fused)}/22: {fused}")
    print(f"fallback: {fell_back}")


if __name__ == "__main__":
    main()
