#!/bin/bash
set -o pipefail
# Round-5 on-chip measurement queue (written during the tunnel outage —
# run when the chip is reachable; strictly ONE python process at a time,
# the tunnel wedges under concurrent backend inits).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
run() {
  echo "=== $1 (t=$(date +%H:%M:%S)) ==="
  timeout "$2" python -u $3 2>&1 | grep -v "Platform 'axon'"
  echo "=== rc=$? ==="
}
run bench.py        1200 bench.py
run bench_var       1800 "benchmarks/bench_var.py"
run bench_sharded   2700 "benchmarks/bench_sharded.py all"
run bench_sorted    2700 "benchmarks/bench_sorted.py all"
run mfu_128         2400 "benchmarks/bench_dense_mfu.py 128"
run mfu_512         2400 "benchmarks/bench_dense_mfu.py 512"
run mfu_32          2400 "benchmarks/bench_dense_mfu.py 32"
run bench_tiled     2700 "benchmarks/bench_tiled.py 608"
run bench_big_cube  2700 "benchmarks/bench_big.py cube"
run bench_big_perm  2700 "benchmarks/bench_big.py perm"
run bench_wide_perm 2700 "benchmarks/bench_wide.py perm"
echo "=== ALL DONE ==="
