"""Per-operator profiling of TPC-H queries on the current backend.

Usage: python -m bench.profile_q --sf 0.1 --queries 3,5,18 [--peak-gbs 819]
Prints per-op elapsed/output_rows from SQLMetrics after a warm-up run,
plus ROOFLINE accounting (SURVEY.md par.7 step 9): estimated bytes touched
per operator (output capacity x column widths, x2 for the sort-dominated
join/sort ops) over elapsed time -> effective GB/s and % of the HBM
speed-of-light (--peak-gbs; v5e HBM ~819 GB/s, use ~50 for one CPU core).
An op far below peak is dispatch/padding-bound, not bandwidth-bound.
"""
import os as _os
_os.environ.setdefault(
    "DATAFUSION_TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "../.jax_cache"),
)
import argparse, time
import numpy as np


class _Zero:
    value = 0


SQLMetricZero = _Zero()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--queries", type=str, default="3,5,18")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--block", action="store_true",
                    help="drain the device after every operator so per-op "
                         "elapsed is DEVICE time, not dispatch time")
    ap.add_argument("--trace", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the warm run "
                         "into DIR (view with tensorboard/xprof)")
    ap.add_argument("--peak-gbs", type=float, default=819.0,
                    help="HBM speed-of-light for the roofline %% (v5e: 819)")
    args = ap.parse_args()
    if args.cpu:
        import jax; jax.config.update("jax_platforms", "cpu")
    if args.block:
        from datafusion_tpu.ops import base as _base
        _base.PROFILE_BLOCKING = True

    from datafusion_tpu import ExecutionContext
    from datafusion_tpu.ops.base import collect_plan_metrics
    from .tpch import get_query_sql, load_engine_tables
    from .tpch_datagen import generate_tpch as generate

    data = generate(args.sf)
    ctx = ExecutionContext()
    load_engine_tables(ctx, data)

    for q in map(int, args.queries.split(",")):
        sql = [s for s in get_query_sql(q).split(";") if s.strip()]
        assert len(sql) == 1, "use simple queries for profiling"
        df = ctx.sql(sql[0])
        lp = ctx.optimize(df.logical_plan())
        # warm-up (compile)
        phys = ctx.create_physical_plan(lp)
        t0 = time.perf_counter()
        out = phys.execute()
        _ = np.asarray(out.columns[-1].data[:1])
        cold = time.perf_counter() - t0
        # timed run on the SAME tree (per-instance jit caches stay warm);
        # zero the metrics first
        def zero(p):
            for _, m in p.metrics.items():
                m.value = 0
            for c in p.children():
                zero(c)
        zero(phys)
        from datafusion_tpu.columnar.table import HOST_SYNCS

        s0 = HOST_SYNCS[0]
        import contextlib

        import jax as _jax

        tracer = (
            _jax.profiler.trace(args.trace)
            if args.trace
            else contextlib.nullcontext()
        )
        with tracer:
            t0 = time.perf_counter()
            out = phys.execute()
            _ = np.asarray(out.columns[-1].data[:1])
            warm = time.perf_counter() - t0
        syncs = HOST_SYNCS[0] - s0
        print(
            f"\n=== q{q}: cold {cold*1e3:.1f} ms, warm {warm*1e3:.1f} ms, "
            f"{syncs} row-count syncs (~28 ms each on TPU) ==="
        )
        # per-op: walk the tree, print elapsed per node (not aggregated by type)
        def walk(p, d=0):
            mo = getattr(p, "_metrics_out", None)
            if mo is not None:
                p.metrics.counter("output_rows").add(mo.nrows)
                p.metrics.counter("output_capacity").add(mo.capacity)
                width = sum(
                    c.data.dtype.itemsize + 1 for c in mo.columns
                )
                # sort-based ops stream the buffer through a few sorting-
                # network passes; elementwise ops touch it ~once each way
                from datafusion_tpu.ops.join import HashJoinExec
                from datafusion_tpu.ops.sort import SortExec
                factor = 4 if isinstance(p, (HashJoinExec, SortExec)) else 2
                p.metrics.counter("est_bytes").add(mo.capacity * width * factor)
                p._metrics_out = None
            ns = dict(p.metrics.items())
            el = ns.get("elapsed_ns"); rows = ns.get("output_rows")
            line = "  " * d + p._display_line()[:90]
            extra = []
            if el: extra.append(f"{el.value/1e6:.1f} ms")
            if rows: extra.append(f"{rows.value} rows")
            cap = ns.get("output_capacity")
            if cap: extra.append(f"cap {cap.value}")
            b = ns.get("est_bytes")
            if b and el and el.value:
                # own time: the execute() timer includes children
                kids_ns = sum(
                    (dict(c.metrics.items()).get("elapsed_ns") or SQLMetricZero).value
                    for c in p.children()
                )
                own = max(el.value - kids_ns, 1)
                gbs = b.value / own  # bytes/ns == GB/s
                extra.append(f"own {own/1e6:.1f} ms, {gbs:.2f} GB/s = {100*gbs/args.peak_gbs:.1f}% peak")
            print(f"{line}  [{', '.join(extra)}]")
            for c in p.children():
                walk(c, d + 1)
        walk(phys)


if __name__ == "__main__":
    main()
