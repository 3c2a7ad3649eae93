#!/bin/bash
# Round-4 TPU bench queue — RE-ENTRANT (same machinery as run_bench_r3.sh).
# Round 3's lesson: every recorded cell must be re-earned by the code as it
# ships (the round-3 tables predate the septet/prefix/fused-dot circuits).
# So this queue re-measures EVERYTHING, in value order:
#   1. headline bench (non-null BENCH capture first — round 3 ended with null)
#   2. gate tables (IV + phases + compound)
#   3. add/mul/vector refresh incl. the A/B lever rows (septet, lookahead)
#   4. cipher API (divide <= 2.5 s target row)
#   5. the 5 never-measured published cells: linreg binary+numerical (Table X),
#      Cannon 8x8/16x16 (Table IX), 24-bit multiply (Table VII, in stage 3)
#   6. matmul tree 2..16 (+ Cannon within BENCH_CANNON_MAX)
# Each writer stamps its section with {commit, utc}; tools/provenance.py
# turns staleness into a mechanical failure.
cd /root/repo || exit 1
STAMPS=${STAMPS:-/tmp/bench_r4_stamps}
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

# Value order under a finite hardware window (the round-3 lesson, twice):
# the never-measured round-4 levers + never-filled published cells run FIRST;
# the hour-scale refreshes (matmul16, linreg numerical) run LAST so a tunnel
# death or round end can only cost the most expensive refresh, not the levers.
run_stage headline 2400 nolock bash -c 'set -o pipefail; python -u bench.py | tee /tmp/bench_headline_r4.json'
run_stage gates    3600 lock python -u tools/bench_suite.py --exp gates phases compound
run_stage add_mul  5400 lock python -u tools/bench_suite.py --exp add mul
# probe stages for the round-4 kernels: generous for first compiles but
# bounded so a stalled axon AOT can't eat hours (both re-entrant; bench_chain
# checkpoints each row as it lands)
run_stage chain_probe      1800 lock python -u tools/bench_chain.py
run_stage cipher   2400 lock python -u tools/bench_cipher.py
run_stage headline_fuseks  1800 nolock bash -c 'set -o pipefail; BENCH_FUSEKS_AB=1 python -u bench.py | tee /tmp/bench_headline_fuseks_r4.json'
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
