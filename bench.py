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
if _os.environ.get("JAX_PLATFORMS"):
    # entry point we own: the env var is the launcher's explicit backend
    # choice; re-assert it over the axon site hook's 'axon,cpu' config
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover
        pass

import json
import os
import statistics
import sys
import time

BASELINE_Q1_SF1_MS = 1956.11


def full_suite():
    """BENCH_FULL=1: all 22 queries at BENCH_SF with full tables; per-query
    medians land in bench/RESULTS_SF{sf}.json (the SURVEY §6 / BASELINE.md
    per-query record).  stdout stays machine-parseable: the driver contract
    of ONE JSON line (the Q1 headline) is preserved by main()."""
    sf = float(os.environ.get("BENCH_SF", "1.0"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    qs = os.environ.get("BENCH_QUERIES", "")
    queries = (
        [int(x) for x in qs.split(",") if x] if qs else list(range(1, 23))
    )
    from bench.tpch import bench as tpch_bench

    host_tables = tuple(
        x for x in os.environ.get("BENCH_HOST_TABLES", "").split(",") if x
    )
    import jax

    tag = os.environ.get("BENCH_TAG", "")
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bench",
        f"RESULTS_SF{sf:g}{tag}.json",
    )
    out = {
        "sf": sf,
        "iters": iters,
        "backend": jax.devices()[0].platform,
        "median_ms": {},
        "total_ms": 0.0,
    }
    if host_tables:
        out["host_tables"] = list(host_tables)
    # resume: merge with an existing record (same backend) so a sweep cut
    # off by a timeout can be continued with BENCH_QUERIES=<rest>
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
            if prev.get("backend") == out["backend"] and prev.get("sf") == sf:
                out["median_ms"].update(prev.get("median_ms", {}))
        except Exception:
            pass

    def _checkpoint(q, times):
        # write after EVERY query: a timeout mid-suite keeps what finished
        out["median_ms"][str(q)] = round(statistics.median(times) * 1000, 2)
        out["total_ms"] = round(sum(out["median_ms"].values()), 1)
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    tpch_bench.on_query_done = _checkpoint
    tpch_bench(sf, queries, iterations=iters, host_tables=host_tables)
    meds = out["median_ms"]
    print(f"wrote {path}: total {out['total_ms']} ms over {len(meds)} queries",
          file=sys.stderr)


def _ensure_backend():
    """The axon (remote-TPU) backend can be DOWN (tunnel outages of
    hours were observed); a crashed headline run records nothing, so
    probe first and fall back to CPU with the backend labeled in the
    output line rather than raising."""
    import subprocess

    for _ in range(2):
        try:
            # DEVNULL, not capture: the remote-TPU plugin can spawn a
            # tunnel helper that inherits captured pipes and never closes
            # them — communicate() would then block past the timeout kill
            r = subprocess.run(
                [sys.executable, "-c", "import jax; assert jax.devices()"],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
                timeout=300,
            )
            if r.returncode == 0:
                return "device"
        except subprocess.TimeoutExpired:
            pass
        time.sleep(20)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover
        pass
    return "cpu-fallback"


def main():
    sf = float(os.environ.get("BENCH_SF", "1.0"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    backend_state = "device"
    if not os.environ.get("JAX_PLATFORMS"):
        try:
            backend_state = _ensure_backend()
        except Exception:
            backend_state = "device"  # probe machinery failed: try normally

    import jax

    from datafusion_tpu import ExecutionContext
    from bench.tpch import get_query_sql, load_engine_tables
    from bench.tpch_datagen import generate_tpch

    # THE headline definition (one per engine, BASELINE.md): warm median
    # of TPC-H Q1 at SF1 over the FULL 16-column lineitem from the
    # standard datagen — identical data to bench/RESULTS_SF1.json's q1 row
    # and bench/tpu_session.sh.  (Rounds 1-3 used a trimmed 7-column
    # lineitem here, which made three different "Q1" numbers coexist.)
    ctx = ExecutionContext()
    data = generate_tpch(sf)
    load_engine_tables(ctx, {"lineitem": data["lineitem"]})
    sql = get_query_sql(1)

    import numpy as np

    def sync(res):
        # ONE tiny D2H on the last-enqueued column: device streams execute
        # in order, so this proves every column's program completed.  (A
        # per-column jax.block_until_ready costs one ~30ms RPC round trip
        # PER ARRAY through the remote-TPU tunnel and would swamp the
        # measurement with harness overhead.)
        _ = np.asarray(res.columns[-1].data[:1])

    # methodology (BASELINE.md, unified with bench/RESULTS_*.json): two
    # warm-ups — iteration 1 pays cache loads + tracing + capacity
    # learning, iteration 2 builds the learned-shape whole-query program —
    # then the median of `iters` steady-state runs.  Warn when the host
    # core is busy: the TPU client's host-side work is on the critical
    # path at ~30 ms scales and a loaded host inflates the median.
    try:
        load1 = os.getloadavg()[0]
        if load1 > 1.5:
            print(
                f"WARNING: host load {load1:.1f} — headline medians are "
                "only valid on an idle host",
                file=sys.stderr,
            )
    except OSError:  # pragma: no cover
        pass
    for _ in range(2):
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
    out = {
        "metric": f"tpch_q1_sf{sf:g}_latency",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_Q1_SF1_MS / ms, 3),
    }
    if backend_state != "device":
        out["backend"] = jax.devices()[0].platform
        out["note"] = "TPU backend unavailable; CPU fallback"
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("BENCH_FULL"):
        full_suite()
    main()
