"""Per-query wall-clock of the two GOLDEN engines at a given SF.

The Rust reference cannot be built in this image (no cargo/rustc), so the
honest per-query baseline column next to the TPU medians is the wall-clock
of the independent oracles this engine is verified against: sqlite (the
row-exact golden of bench/golden.py) and the hand-written pandas programs
(bench/golden_pandas.py).  Writes bench/GOLDEN_SF{sf}.json:

    {"sf": .., "host": "cpu", "sqlite_ms": {q: ms}, "pandas_ms": {q: ms}}

`python -m bench.golden_times --merge` folds the file into
bench/RESULTS_SF{sf}.json as a "golden_ms" block so every TPU median sits
next to the numbers it must beat (VERDICT r3 next-step #7).

Usage:
  JAX_PLATFORMS=cpu python -m bench.golden_times [--sf 1] [--queries 1,2,...]
  python -m bench.golden_times --merge [--sf 1]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--queries", type=str, default=",".join(map(str, range(1, 23))))
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--skip-sqlite", action="store_true")
    args = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    gpath = os.path.join(here, f"GOLDEN_SF{args.sf:g}.json")
    rpath = os.path.join(here, f"RESULTS_SF{args.sf:g}.json")

    if args.merge:
        with open(gpath) as f:
            g = json.load(f)
        with open(rpath) as f:
            r = json.load(f)
        r["golden_ms"] = {
            q: {
                "sqlite": g["sqlite_ms"].get(q),
                "pandas": g["pandas_ms"].get(q),
            }
            for q in sorted(
                set(g["sqlite_ms"]) | set(g["pandas_ms"]), key=int
            )
        }
        with open(rpath, "w") as f:
            json.dump(r, f, indent=1, sort_keys=True)
        print(f"merged golden_ms into {rpath}")
        return

    queries = [int(x) for x in args.queries.split(",") if x]
    from .golden import load_sqlite
    from .golden_pandas import QUERIES, _frames
    from .tpch import golden_query
    from .tpch_datagen import generate_tpch

    print(f"datagen sf={args.sf} ...", flush=True)
    data = generate_tpch(args.sf)
    out = {"sf": args.sf, "host": "cpu", "sqlite_ms": {}, "pandas_ms": {}}
    if os.path.exists(gpath):
        try:
            with open(gpath) as f:
                prev = json.load(f)
            if prev.get("sf") == args.sf:
                out["sqlite_ms"].update(prev.get("sqlite_ms", {}))
                out["pandas_ms"].update(prev.get("pandas_ms", {}))
        except Exception:
            pass

    def save():
        with open(gpath, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    # frames build once (the analogue of sqlite's pre-timed load): the
    # timed region is the query program itself
    print("building pandas frames ...", flush=True)
    frames = _frames(data)
    for q in queries:
        t0 = time.perf_counter()
        rows = QUERIES[q](frames)
        out["pandas_ms"][str(q)] = round((time.perf_counter() - t0) * 1000, 1)
        print(f"q{q} pandas: {out['pandas_ms'][str(q)]} ms ({len(rows)} rows)",
              flush=True)
        save()

    if not args.skip_sqlite:
        print("loading sqlite ...", flush=True)
        t0 = time.perf_counter()
        conn = load_sqlite(data)
        print(f"sqlite load: {time.perf_counter() - t0:.1f}s", flush=True)
        for q in queries:
            t0 = time.perf_counter()
            rows = golden_query(conn, q)
            out["sqlite_ms"][str(q)] = round(
                (time.perf_counter() - t0) * 1000, 1
            )
            print(
                f"q{q} sqlite: {out['sqlite_ms'][str(q)]} ms ({len(rows)} rows)",
                flush=True,
            )
            save()
    print(f"wrote {gpath}")


if __name__ == "__main__":
    main()
