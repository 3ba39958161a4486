#!/usr/bin/env bash
# One-shot TPU benchmark session (round 4): run everything worth recording
# while the tunnel is healthy, sequentially (never two TPU pipelines at
# once — the compile service wedges).  Every program is novel this round
# (packed gathers / fused AB joins / FK phase-B / i32 rides), so compile
# time dominates the cold pass; the persistent .jax_cache makes reruns
# warm.  Usage: nohup bash bench/tpu_session.sh > /tmp/tpu_session.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

echo "=== probe ==="
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== headline: Q1 SF1 (full 16-column lineitem — THE definition) ==="
timeout 2400 python bench.py

echo "=== full suite SF1 (3 iters) -> bench/RESULTS_SF1.json ==="
BENCH_FULL=1 BENCH_SF=1 BENCH_ITERS=3 timeout 16200 python bench.py

echo "=== nyctaxi (re-record on current code) ==="
timeout 2400 python -m bench.nyctaxi || true

echo "=== full suite SF0.1 -> bench/RESULTS_SF0.1.json (restored, all 22) ==="
BENCH_FULL=1 BENCH_SF=0.1 BENCH_ITERS=3 timeout 7200 python bench.py

echo "=== single-chip TPU scaling anchor (ndev=1 absolute rows/s) ==="
timeout 2400 python -m bench.scaling --devices 1 --rows 2000000 || true

echo "=== per-op device-time profile q18 SF1 (tail verification) ==="
timeout 5400 python -m bench.profile_q --block --sf 1 --queries 18 || true

echo "=== DONE ==="
