#!/bin/bash
# Round-5 TPU bench queue — RE-ENTRANT (same machinery as run_bench_r4.sh).
# The round-4 verdict's gate: finish the measurement queue at ONE shipped
# commit — every section provenance-stamped, no nulls, RESULTS == JSON.
# This queue re-measures EVERYTHING at the r5 routing defaults (fused-KS on,
# chain VM deleted, width-aware adder/septet dispatch), in value order:
#   1. headline incl. the fused-vs-split KS A/B + differentials
#   2. gate tables (IV + phases + compound)
#   3. add/mul refresh incl. A/B lever rows (septet at 16/24/32, lookahead)
#   4. cipher API (divide <= 2.5 s target row)
#   5. multichip_hw: shard_map x Pallas on real silicon (VERDICT r4 #5)
#   6. ceiling sweep (B footprint + fused-KS cells + r5 experiments)
#   7. vector tables (VI + VIII, both widths)
#   8. matmul tree 2..8 + Cannon 8
#   9. linreg binary (Table X)
#  10. matmul16 + Cannon 16 (the >= 8x target row)
#  11. linreg numerical (Table X)
cd /root/repo || exit 1
STAMPS=${STAMPS:-/tmp/bench_r5_stamps}
mkdir -p "$STAMPS"
RETRY=0

run_stage() {  # run_stage <name> <timeout_s> <lock|nolock> <cmd...>
  local name=$1 tmo=$2 lock=$3; shift 3
  local n
  n=$(cat "$STAMPS/$name.n" 2>/dev/null || echo 0)
  if [ -f "$STAMPS/$name.done" ]; then
    echo "== $name: already done =="
    return 0
  fi
  if [ "$n" -ge 3 ]; then
    echo "== $name: given up after $n attempts =="
    return 0
  fi
  n=$((n + 1))
  echo "$n" > "$STAMPS/$name.n"
  echo "=== $name (attempt $n) at $(date) ==="
  local ok=0
  if [ "$lock" = lock ]; then
    timeout "$tmo" flock /tmp/tfhe_device.lock "$@" && ok=1
  else
    timeout "$tmo" "$@" && ok=1   # bench.py takes the device lock itself
  fi
  if [ "$ok" = 1 ]; then
    touch "$STAMPS/$name.done"
    echo "=== $name DONE at $(date) ==="
  else
    echo "=== $name attempt $n FAILED at $(date) ==="
    [ "$n" -lt 3 ] && RETRY=1
  fi
}

run_stage headline 2400 nolock bash -c 'set -o pipefail; BENCH_FUSEKS_AB=1 python -u bench.py | tee /tmp/bench_headline_r5.json'
run_stage gates    3600 lock python -u tools/bench_suite.py --exp gates phases compound
run_stage add_mul  7200 lock python -u tools/bench_suite.py --exp add mul
run_stage cipher   2400 lock python -u tools/bench_cipher.py
run_stage multichip_hw 3600 lock python -u tools/bench_multichip_hw.py
run_stage ceiling  9000 lock python -u tools/bench_ceiling.py
run_stage vector   5400 lock python -u tools/bench_suite.py --exp vector
run_stage matmul   10800 lock env BENCH_MATMUL_SIZES=2,4,8 BENCH_CANNON_MAX=8 python -u tools/bench_suite.py --exp matmul
run_stage linreg_binary    3600 lock python -u tools/bench_linreg.py --variant binary
run_stage matmul16 14400 lock env BENCH_MATMUL_SIZES=16 BENCH_CANNON_MAX=16 python -u tools/bench_suite.py --exp matmul
run_stage linreg_numerical 7200 lock python -u tools/bench_linreg.py --variant numerical

echo "=== published-cell coverage + provenance audit + RESULTS regeneration ==="
python tools/check_baseline_coverage.py
python tools/update_results.py
python tools/provenance.py
exit $RETRY
