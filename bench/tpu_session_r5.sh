#!/usr/bin/env bash
# Round-5 TPU recording session on the CURRENT tree (whole-query fusion,
# backend-adaptive kernels).  One query per process with hard timeouts —
# a wedged compile costs one slot, not the session.  Never run while
# another TPU pipeline is active.
#   nohup bash bench/tpu_session_r5.sh > /tmp/tpu_r5.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
export DATAFUSION_TPU_JAX_CACHE=/root/repo/.jax_cache
export DFTPH_DATA_CACHE=/root/repo/bench/.tpch_cache

echo "=== probe ==="
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== headline: Q1 SF1 (driver definition; 2 warmups + median of 5) ==="
timeout 3600 python bench.py

echo "=== SF1 per-query record, losers first (r4: q2/q8/q9/q18 lost to pandas) ==="
for pass in 0 1; do
  for q in 2 8 9 18 7 1 6 3 4 5 12 13 14 19 11 15 16 20 21 22 17 10; do
    done_q=$(python - "$q" <<'EOF'
import json, os, sys
q = int(sys.argv[1]); done = False
p = "bench/RESULTS_SF1.json"
if os.path.exists(p):
    j = json.load(open(p))
    done = j.get("backend") == "tpu" and str(q) in j.get("median_ms", {})
print("yes" if done else "no")
EOF
)
    [ "$done_q" = "yes" ] && continue
    BENCH_FULL=1 BENCH_SF=1 BENCH_ITERS=5 BENCH_QUERIES="$q" \
      timeout 3600 python bench.py || true
  done
done

echo "=== nyctaxi (round-5 code) ==="
timeout 2400 python -m bench.nyctaxi || true

echo "=== single-chip TPU scaling anchor ==="
timeout 2400 python -m bench.scaling --devices 1 --rows 2000000 || true

echo "=== per-op blocked profile of the tail (r5-dated PROFILE_SF1) ==="
timeout 7200 python -m bench.profile_q --block --sf 1 --queries 18,9,7 || true

echo "=== SF0.1 full 22 (one per process) ==="
for q in $(seq 1 22); do
  done_q=$(python - "$q" <<'EOF'
import json, os, sys
q = int(sys.argv[1]); done = False
p = "bench/RESULTS_SF0.1.json"
if os.path.exists(p):
    j = json.load(open(p))
    done = j.get("backend") == "tpu" and str(q) in j.get("median_ms", {})
print("yes" if done else "no")
EOF
)
  [ "$done_q" = "yes" ] && continue
  BENCH_FULL=1 BENCH_SF=0.1 BENCH_ITERS=3 BENCH_QUERIES="$q" \
    timeout 2700 python bench.py || true
done

echo "=== ALL DONE ==="
