"""Reproducible microbenchmarks behind bench/MICRO.md.

Every rule in MICRO.md ("no cap-sized scatters", "payload-carrying sorts
beat argsort+gather", "merge-rank beats searchsorted", "chain dispatches,
sync once") traces to a row here; run this file to reproduce the numbers
on the current backend (VERDICT r1: the scripts were not checked in).

Usage:
    python bench/micro.py                 # all single-device benches
    python bench/micro.py --n 20          # 2^20 rows instead of 2^23
    python bench/micro.py --only cosort,merge_rank
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python bench/micro.py --only exchange_overlap

Numbers are backend-relative: on the real TPU (axon tunnel) each timing
includes the ~28 ms per-sync dispatch latency; on CPU the ratios differ
but the orderings that motivated the kernel rules still hold.  The
exchange_overlap bench needs >=2 devices (virtual CPU mesh or real
multi-chip) — it measures the double-buffered collective/compute overlap
pipeline (SURVEY.md §2.8 "double-buffered exchange overlapping collective
transfer with probe/scan compute").
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "DATAFUSION_TPU_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np


def _sync(x):
    """Real device sync: D2H a tiny slice (block_until_ready does not
    synchronize through the axon tunnel; see MICRO.md)."""
    return np.asarray(x.reshape(-1)[:1])


def timeit(fn, iters=5):
    fn()  # compile + warm
    _ = fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        ts.append((time.perf_counter() - t0) * 1000)
    return statistics.median(ts)


# ---------------------------------------------------------------------------
# single-device benches
# ---------------------------------------------------------------------------


def bench_noop(jnp, jax, n):
    x = jnp.zeros(8, jnp.int32)
    f = jax.jit(lambda x: x + 1)
    return {"noop (sync floor)": timeit(lambda: f(x))}


def bench_reduce(jnp, jax, n):
    x = jnp.arange(n, dtype=jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x).reshape(1))
    return {"f32 full reduction": timeit(lambda: f(x))}


def bench_cosort(jnp, jax, n):
    import jax.lax as lax

    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, n, n))
    pays = [jnp.asarray(rng.integers(0, n, n)) for _ in range(4)]

    def argsort_gather(key, *pays):
        order = jnp.argsort(key, stable=True)
        return tuple(p[order] for p in pays)

    def variadic(key, *pays):
        out = lax.sort((key,) + pays, num_keys=1, is_stable=True)
        return out[1:]

    f1 = jax.jit(argsort_gather)
    f2 = jax.jit(variadic)
    return {
        "stable argsort + 4 payload gathers": timeit(lambda: f1(key, *pays)[0]),
        "lax.sort 1 key + 4 payloads": timeit(lambda: f2(key, *pays)[0]),
    }


def bench_merge_rank(jnp, jax, n):
    from datafusion_tpu.ops import kernels as K

    rng = np.random.default_rng(1)
    build = jnp.asarray(np.sort(rng.integers(0, n, n)).astype(np.uint64))
    probe = jnp.asarray(rng.integers(0, n, n).astype(np.uint64))
    ok = jnp.ones(n, bool)

    def merge_rank(build, probe):
        lo, counts = K.join_probe_counts(build, probe, ok, jnp.int64(n))
        return lo

    def searchsorted(build, probe):
        return jnp.searchsorted(build, probe)

    f1 = jax.jit(merge_rank)
    out = {"merge-rank via ONE variadic sort": timeit(lambda: f1(build, probe))}
    if n <= 1 << 20:  # searchsorted at 8M takes ~5 s per iter on TPU
        f2 = jax.jit(searchsorted)
        out["jnp.searchsorted"] = timeit(lambda: f2(build, probe))
    return out


def bench_gather(jnp, jax, n):
    from datafusion_tpu.ops import kernels as K

    rng = np.random.default_rng(2)
    data = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))
    f1 = jax.jit(lambda d, i: d[i])
    f2 = jax.jit(K.gather64)
    return {
        "gather i64 (random idx)": timeit(lambda: f1(data, idx)),
        "gather64 (int32-pair rows)": timeit(lambda: f2(data, idx)),
    }


def bench_compact(jnp, jax, n):
    from datafusion_tpu.ops import kernels as K

    rng = np.random.default_rng(3)
    keep = jnp.asarray(rng.random(n) < 0.5)
    cols = tuple(jnp.asarray(rng.integers(0, n, n)) for _ in range(2))
    vals = tuple(jnp.ones(n, bool) for _ in range(2))
    f = jax.jit(lambda k: K.filter_compact(cols, vals, k, jnp.int64(n))[0][0])

    def scatter_compact(k):
        pos = jnp.cumsum(k) - 1
        tgt = jnp.where(k, pos, n - 1)
        return jnp.zeros(n, cols[0].dtype).at[tgt].set(cols[0])

    f2 = jax.jit(scatter_compact)
    return {
        "filter_compact (variadic sort, 2 cols)": timeit(lambda: f(keep)),
        "filter scatter-compact": timeit(lambda: f2(keep)),
    }


def bench_segment_sum(jnp, jax, n):
    from datafusion_tpu.ops import kernels as K

    rng = np.random.default_rng(4)
    g = 16
    gid = jnp.asarray(np.sort(rng.integers(0, g, n)))
    vals = jnp.asarray(rng.random(n).astype(np.float32))
    f1 = jax.jit(lambda v, gi: K.segment_sum(v, gi, g))
    f2 = jax.jit(lambda v, gi: jnp.zeros(g, v.dtype).at[gi].add(v))
    return {
        "segment_sum sorted-scan (G=16)": timeit(lambda: f1(vals, gid)),
        "segment_sum scatter-add (G=16)": timeit(lambda: f2(vals, gid)),
    }


def bench_dispatch_chain(jnp, jax, n):
    x = jnp.arange(n, dtype=jnp.int64)
    f = jax.jit(lambda x: x * 3 + 1)

    def chain10(x):
        for _ in range(10):
            x = f(x)
        return x

    return {
        "1 dispatch, one sync": timeit(lambda: f(x)),
        "10 chained dispatches, one sync": timeit(lambda: chain10(x)),
    }


# ---------------------------------------------------------------------------
# multi-device: double-buffered exchange overlap
# ---------------------------------------------------------------------------


def bench_exchange_overlap(jnp, jax, n):
    """Monolithic all_to_all-then-probe vs double-buffered chunked exchange.

    The chunked variant scans over C chunks carrying the in-flight receive
    buffer: the all_to_all for chunk c+1 has no data dependency on chunk
    c's probe compute, so XLA's latency-hiding scheduler overlaps the
    collective transfer with the probe (SURVEY.md §2.8 pipeline mapping).
    On single-host CPU meshes collectives are memcpys and the two variants
    tie; on real multi-chip ICI the overlap hides the transfer time."""
    import jax.lax as lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        return {"exchange_overlap": float("nan")}
    ndev = len(devs)
    mesh = Mesh(np.array(devs), ("dp",))
    per = max(n // ndev, 1 << 12)
    C = 8
    chunk = per // C
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.integers(0, n, (ndev * per,)).astype(np.int64))
    data = jax.device_put(data, NamedSharding(mesh, P("dp")))
    build = jnp.asarray(np.sort(rng.integers(0, n, per)).astype(np.int64))

    def probe(local, build):
        # stand-in probe: payload sort + rank prefix (the join hot loop)
        s = lax.sort((local,), num_keys=1)[0]
        return jnp.sum(jnp.searchsorted(build[: 1 << 10], s[:: 64]))

    def mono(x):
        recv = lax.all_to_all(
            x.reshape(ndev, per // ndev), "dp", split_axis=0, concat_axis=0
        ).reshape(-1)
        return probe(recv, build).reshape(1)

    def pipelined(x):
        chunks = x.reshape(C, chunk)

        def shuffle(c):
            return lax.all_to_all(
                c.reshape(ndev, chunk // ndev), "dp", split_axis=0, concat_axis=0
            ).reshape(-1)

        def body(carry, nxt):
            inflight, acc = carry
            started = shuffle(nxt)        # overlaps with probe(inflight)
            acc = acc + probe(inflight, build)
            return (started, acc), 0

        first = shuffle(chunks[0])
        (last, acc), _ = lax.scan(body, (first, jnp.int64(0)), chunks[1:])
        acc = acc + probe(last, build)
        return acc.reshape(1)

    f1 = jax.jit(
        jax.shard_map(mono, mesh=mesh, in_specs=(P("dp"),), out_specs=P("dp"))
    )
    f2 = jax.jit(
        jax.shard_map(pipelined, mesh=mesh, in_specs=(P("dp"),), out_specs=P("dp"))
    )
    return {
        f"exchange+probe monolithic ({ndev}dev)": timeit(lambda: f1(data)),
        f"exchange+probe double-buffered C={C}": timeit(lambda: f2(data)),
    }


BENCHES = {
    "noop": bench_noop,
    "reduce": bench_reduce,
    "dispatch_chain": bench_dispatch_chain,
    "cosort": bench_cosort,
    "merge_rank": bench_merge_rank,
    "gather": bench_gather,
    "compact": bench_compact,
    "segment_sum": bench_segment_sum,
    "exchange_overlap": bench_exchange_overlap,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=23, help="log2 row count")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax

    # the container's sitecustomize forces the axon TPU backend; honor an
    # explicit JAX_PLATFORMS request (config.update wins over the env var)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    n = 1 << args.n
    names = [s for s in args.only.split(",") if s] or list(BENCHES)
    print(f"backend={jax.default_backend()} devices={len(jax.devices())} N=2^{args.n}")
    print("| op | ms |")
    print("|---|---|")
    for name in names:
        try:
            for label, ms in BENCHES[name](jnp, jax, n).items():
                print(f"| {label} | {ms:.1f} |", flush=True)
        except Exception as e:  # keep the rest of the table useful
            print(f"| {name} | FAILED: {type(e).__name__}: {e} |", flush=True)


if __name__ == "__main__":
    main()
