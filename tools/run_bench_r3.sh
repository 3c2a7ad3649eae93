#!/bin/bash
# Round-3 TPU bench queue — RE-ENTRANT: each stage runs once to completion
# (stamped under $STAMPS); rerunning the script skips finished stages, so the
# watchdog can retry after a tunnel flap without redoing hours of work.
# A stage that fails 3 times is given up (counts as settled) so the watchdog
# terminates. Exit 0 = every stage done or given up.
#
# Stage order = still-missing published cells first (matmul Cannon rows,
# linreg Table X), then the refresh of rows whose circuits changed in round 3
# (prefix adders / septet compressors), then the headline bench.
cd /root/repo || exit 1
STAMPS=${STAMPS:-/tmp/bench_r3_stamps}
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

run_stage matmul  7200 lock env BENCH_MATMUL_SIZES=2,4,8,16 python -u tools/bench_suite.py --exp matmul
run_stage linreg_binary    3600 lock python -u tools/bench_linreg.py --variant binary
run_stage linreg_numerical 4800 lock python -u tools/bench_linreg.py --variant numerical
run_stage cipher  1800 lock python -u tools/bench_cipher.py
run_stage add_mul_vector 3600 lock python -u tools/bench_suite.py --exp add mul vector
run_stage headline 1800 nolock bash -c 'set -o pipefail; python -u bench.py | tee /tmp/bench_headline_r3.json'
run_stage cannon16 7200 lock env BENCH_MATMUL_SIZES=16 BENCH_CANNON_MAX=16 python -u tools/bench_suite.py --exp matmul

echo "=== published-cell coverage audit + RESULTS regeneration ==="
python tools/check_baseline_coverage.py
python tools/update_results.py
exit $RETRY
