"""Scaling-efficiency benchmark: a join + group-by + sort pipeline at
1/2/4/8 devices (the distributed benchmark set analogue of the reference,
/root/reference/benchmarks/run.sh:22-26, measured as rows/s).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m bench.scaling [--rows 2000000] [--iters 3]

Tables are sharded onto the mesh ONCE (data lives distributed, as in any
real deployment); the timed region is the distributed pipeline itself:
partitioned/broadcast dist_join -> dist_aggregate (partial -> all_to_all
re-key -> final) -> dist_sort.  Writes bench/SCALING.json with, per device
count and join mode, warm wall-clock, rows/s, and the per-shard exchange
receive capacity.  Two things to read off it:

- rows/s vs ndev = scaling efficiency (>= 80% is the north-star target on
  real chips; on the shared-CPU virtual mesh every "device" runs on the
  same cores, so wall-clock tracks TOTAL work across shards — flat time
  vs ndev means per-chip work is shrinking ~1/ndev, which is the property
  under test; time growing ~linearly with ndev means the exchange is doing
  full-table work per shard).
- recv_cap / bucket_cap vs ndev = per-shard exchange memory: O(N/ndev)
  with the scalable default buckets (reference repartition.rs:285-330
  keeps only each partition's share), vs O(N) with full-table buckets.
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

import numpy as np


def build_tables(rows: int):
    """Fact table (rows) + dimension table (1/100 of it): the two-table
    join + aggregate shape of TPC-H q3/q5/q18's inner pipelines."""
    from datafusion_tpu.columnar import Table

    rng = np.random.default_rng(42)
    ndim = max(rows // 100, 64)
    fact = Table.from_pydict(
        {
            "fk": rng.integers(0, ndim, rows).astype(np.int64),
            "qty": rng.integers(1, 50, rows).astype(np.int64),
            "price": rng.integers(100, 10000, rows).astype(np.int64),
        }
    )
    dim = Table.from_pydict(
        {
            "dk": np.arange(ndim, dtype=np.int64),
            "seg": rng.integers(0, 25, ndim).astype(np.int64),
        }
    )
    return fact, dim


def run_at(ndev: int, fact, dim, iters: int, broadcast: bool):
    from datafusion_tpu.exprs.physical import PhysBinary, PhysCol
    from datafusion_tpu.ops.aggregate import PhysAggExpr
    from datafusion_tpu.ops.sort import PhysSortExpr
    from datafusion_tpu.parallel.mesh import ShardedTable, make_mesh
    from datafusion_tpu.parallel.ops import dist_aggregate, dist_join, dist_sort
    from datafusion_tpu.types.dtypes import INT64

    mesh = make_mesh(ndev)
    sl = ShardedTable.from_table(fact, mesh)
    sd = ShardedTable.from_table(dim, mesh)
    on = [(PhysCol("fk", 0, INT64), PhysCol("dk", 0, INT64))]
    # joined schema: fk qty price dk seg
    seg = PhysCol("seg", 4, INT64)
    rev = PhysBinary(
        PhysCol("qty", 1, INT64), "*", PhysCol("price", 2, INT64), INT64
    )
    group = [(seg, "seg")]
    aggs = [
        PhysAggExpr("count", None, "n"),
        PhysAggExpr("sum", rev, "rev"),
    ]

    def once():
        j = dist_join(sl, sd, on, "inner", broadcast=broadcast).shrink()
        a = dist_aggregate(j, group, aggs).shrink()
        s, _ = dist_sort(
            a, [PhysSortExpr(PhysCol("rev", 2, INT64), ascending=False)]
        )
        # D2H one element of the last column: device streams execute in
        # order, so this proves every program completed
        _ = np.asarray(s.datas[-1][:1])
        return j, a, s

    j, a, s = once()  # warm-up (compiles)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        j, a, s = once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    ji = getattr(j, "exchange_info", {})
    ai = getattr(a, "exchange_info", {})
    return {
        "elapsed_ms": round(best * 1000, 2),
        "rows_per_s": round(fact.nrows / best),
        "join_mode": ji.get("mode"),
        "join_bucket_cap": ji.get("bucket_cap"),
        "join_recv_cap": ji.get("recv_cap"),
        "agg_bucket_cap": ai.get("bucket_cap"),
        "output_rows": int(np.sum(np.asarray(s.nrows))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--devices", type=str, default="")
    args = ap.parse_args()

    import jax

    avail = len(jax.devices())
    devs = (
        [int(x) for x in args.devices.split(",") if x]
        if args.devices
        else [d for d in (1, 2, 4, 8) if d <= avail]
    )
    fact, dim = build_tables(args.rows)

    out = {
        "rows": args.rows,
        "iters": args.iters,
        "backend": jax.devices()[0].platform,
        "modes": {},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    # Semantics depend on the backend (recorded explicitly so the artifact
    # is readable without prose): on the shared-core CPU simulation every
    # virtual device runs on the same core, so wall-clock measures TOTAL
    # work across shards — the honest signal is total work staying FLAT as
    # devices are added (per-shard work ~1/ndev).  On real chips each
    # device brings its own compute, so wall-clock IS per-shard time and
    # speedup_vs_1 is a true scaling efficiency numerator.
    shared_core = out["backend"] == "cpu"
    out["wallclock_semantics"] = (
        "total_work_across_shards" if shared_core else "per_shard_time"
    )
    for mode, bcast in (("partitioned", False), ("broadcast", True)):
        per = out["modes"].setdefault(mode, {})
        for nd in devs:
            r = run_at(nd, fact, dim, args.iters, bcast)
            base = per.get("1", r)
            if shared_core:
                # flat total work (ratio ~1.0) == per-shard work ~1/ndev;
                # the exchange's own cost shows up as the drop from 1.0
                r["total_work_vs_1dev"] = round(
                    r["elapsed_ms"] / base["elapsed_ms"], 3
                )
                r["per_shard_work_ms_est"] = round(r["elapsed_ms"] / nd, 2)
            else:
                r["speedup_vs_1"] = round(
                    base["elapsed_ms"] / r["elapsed_ms"], 3
                )
                r["scaling_efficiency"] = round(r["speedup_vs_1"] / nd, 3)
            per[str(nd)] = r
            print(f"{mode} {nd} device(s): {r}", flush=True)
            with open(path, "w") as f:
                json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
