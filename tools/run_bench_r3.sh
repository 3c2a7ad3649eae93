#!/bin/bash
# Round-3 sequential TPU bench session (one process at a time — axon AOT
# compiles are host-side and contend on this single-core box).
set -x
cd /root/repo
echo "=== add + mul + vector tables (prefix adders / Dadda) ==="
timeout 3600 python -u tools/bench_suite.py --exp add mul vector
echo "=== cipher api ==="
timeout 1200 python -u tools/bench_cipher.py
echo "=== linreg binary + numerical (Table X) ==="
timeout 5400 python -u tools/bench_linreg.py --variant binary numerical
echo "=== matmul 2,4,8,16 + cannon<=8 ==="
BENCH_MATMUL_SIZES=2,4,8,16 timeout 7200 python -u tools/bench_suite.py --exp matmul
echo "=== headline bench.py (throughput + kernel differentials) ==="
timeout 1800 python -u bench.py | tee /tmp/bench_headline_r3.json
echo "=== optional: full 16x16 Cannon (Table IX last cell) ==="
BENCH_MATMUL_SIZES=16 BENCH_CANNON_MAX=16 timeout 7200 \
  python -u tools/bench_suite.py --exp matmul
echo "=== published-cell coverage audit ==="
python tools/check_baseline_coverage.py
echo "=== DONE ==="
