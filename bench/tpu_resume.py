"""Resume interrupted TPU full-suite records.

bench.py checkpoints per query and merges with an existing same-backend
record, so a sweep cut off by a timeout (the remote compile service can
take many minutes per novel program) is continued by rerunning just the
missing queries — already-recorded ones are skipped, already-compiled
ones load from the persistent cache.

Usage (ONLY when no other TPU pipeline is active):
  nohup python -m bench.tpu_resume > /tmp/tpu_resume.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def missing(sf: float) -> list[int]:
    path = os.path.join(ROOT, "bench", f"RESULTS_SF{sf:g}.json")
    done: set[int] = set()
    if os.path.exists(path):
        try:
            j = json.load(open(path))
            if j.get("backend") == "tpu":
                done = {int(k) for k in j.get("median_ms", {})}
        except Exception:
            pass
    return [q for q in range(1, 23) if q not in done]


def main():
    sfs = [float(x) for x in (sys.argv[1:] or ["1", "0.1"])]
    for sf in sfs:
        for attempt in range(6):
            todo = missing(sf)
            if not todo:
                print(f"SF{sf:g}: complete", flush=True)
                break
            print(f"SF{sf:g} attempt {attempt}: missing {todo}", flush=True)
            env = dict(
                os.environ,
                BENCH_FULL="1",
                BENCH_SF=str(sf),
                BENCH_ITERS="3",
                BENCH_QUERIES=",".join(map(str, todo)),
            )
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, "bench.py"],
                    cwd=ROOT,
                    env=env,
                    timeout=3 * 3600,
                )
                rc = r.returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"  # per-query checkpoints survive
            print(
                f"SF{sf:g} attempt {attempt}: rc={rc} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
            if missing(sf) == todo:
                # zero progress in a full attempt: stop burning the budget
                print(f"SF{sf:g}: no progress, stopping", flush=True)
                break


if __name__ == "__main__":
    main()
