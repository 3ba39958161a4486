#!/usr/bin/env bash
# One-shot TPU benchmark session: run everything worth recording while the
# tunnel is healthy, sequentially (never two TPU pipelines at once — the
# compile service wedges).  Usage: nohup bash bench/tpu_session.sh > /tmp/tpu_session.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

echo "=== probe ==="
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== headline: Q1 SF1 ==="
timeout 1200 python bench.py

echo "=== full suite SF1 (3 iters) -> bench/RESULTS_SF1.json ==="
BENCH_FULL=1 BENCH_SF=1 BENCH_ITERS=3 timeout 7200 python bench.py

echo "=== full suite SF0.1 -> bench/RESULTS_SF0.1.json (tail comparison) ==="
BENCH_FULL=1 BENCH_SF=0.1 BENCH_ITERS=3 timeout 3600 python bench.py

echo "=== per-op device-time profile q3/q5/q18 SF0.1 ==="
timeout 3600 python -m bench.profile_q --block --sf 0.1 --queries 3,5,18

echo "=== nyctaxi ==="
timeout 1200 python -m bench.nyctaxi || true

echo "=== DONE ==="
