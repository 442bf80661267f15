#!/bin/bash
# Round-2 TPU work queue: run the moment the attachment recovers.
# Each stage is its own process (x64 is process-global) with a generous
# timeout so no client is ever killed mid-compile.  Logs append to
# /tmp/tpu_queue.log; bench rows append to bench_results.jsonl.
set -x
cd /root/repo
LOG=/tmp/tpu_queue.log
J=bench_results.jsonl

echo "=== queue start $(date)" >> $LOG

# 1. gen-ML1M f32 (validates the fori_loop spill fix; new program shape)
timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype float32 \
  --instances gen-instML1M --jsonl $J >> $LOG 2>&1

# 2. A/B the BELL re-gather on the sparse stress instance
timeout 3000 python -u scripts/ab_bell_regather.py \
  tests/fixtures/inst50000-5000-100-2-5.in 300 >> $LOG 2>&1

# 3. toy f64 rows with host-CPU routing (own x64 process)
timeout 1800 python -u -m recsys_tpu.bench.sweep --dtype float64 \
  --instances inst0,inst1,inst2,inst30-40-10-2-10 --jsonl $J >> $LOG 2>&1

# 3b. the three orphan-golden shape analogues, f32 then f64 (the f64
# rows byte-compare against the reference binary's own goldens)
timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype float32 \
  --instances gen-inst1000-80000-20-10-1000,gen-inst20000-10000-40-2-50,gen-inst60000-2000-200-10-20 \
  --jsonl $J >> $LOG 2>&1
timeout 3600 python -u -m recsys_tpu.bench.sweep --dtype float64 \
  --instances gen-inst1000-80000-20-10-1000,gen-inst20000-10000-40-2-50,gen-inst60000-2000-200-10-20 \
  --jsonl $J >> $LOG 2>&1

# 4. headline bench sanity (what the driver runs at round end)
timeout 1800 python -u bench.py >> $LOG 2>&1

# 5. refresh the markdown table from the accumulated rows
python -m recsys_tpu.bench.sweep --render $J --out BENCHMARKS.md >> $LOG 2>&1

echo "=== queue done $(date)" >> $LOG
echo "NEXT: read /tmp/tpu_queue.log; if the re-gather A/B won, flip" >> $LOG
echo "ops/bell.py::REGATHER_FOR_GRADIENT to True and refresh the BELL rows." >> $LOG
