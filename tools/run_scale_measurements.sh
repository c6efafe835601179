#!/usr/bin/env bash
# One-shot sequence of every tunnel-dependent measurement pending from the
# round-2 plan (run them strictly serially: one heavy python at a time on
# this single-core host). Results land in /tmp/scale_results/.
#
#   bash tools/run_scale_measurements.sh
#
# 1. mempool microbenchmark   — page-fault cost with vs without the pool
# 2. iterative-sampler bench  — truncated ancestral/DDIM chip throughput
# 3. single-chip bench.py     — the driver's headline JSON line
# 4. e2e eval at scale        — ~100 volumes, host vs device knob sweep
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/scale_results

run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a /tmp/scale_results/log.txt
  ( time timeout 3600 "$@" ) >"/tmp/scale_results/$name.txt" 2>&1
  echo "rc=$? ($name)" | tee -a /tmp/scale_results/log.txt
  tail -3 "/tmp/scale_results/$name.txt"
}

run mempool      python tools/bench_mempool.py
run samplers     python tools/bench_samplers.py --iters 3
run train        python tools/bench_train.py --iters 10
run bench        python bench.py
export UAD_EVAL_TIMING=1   # per-stage phase breakdown on stderr
run e2e_host     python tools/bench_eval_e2e.py --volumes 25 --backend host
# 200 volumes through the tuned path: the scale regime where the page-fault
# regression used to appear (per-volume cost must stay flat vs the 20-volume
# number; VERDICT round-1 item 3)
run e2e_device   python tools/bench_eval_e2e.py --volumes 50 --backend device \
                   --volumes-per-call 2 --cc-backend device \
                   --hausdorff-backend device --scorer-threads 2
echo "all done" | tee -a /tmp/scale_results/log.txt
