#!/bin/bash
# Idle-host re-measure of the rows poisoned by CPU contention (the
# first refresh ran concurrently with a 12.7 GB pytest process; sweep
# walls are end-to-end and include host staging).  Regather default is
# back OFF, so BELL rows re-validate the committed configuration.
set -x
cd /root/repo
LOG=/tmp/tpu_refresh.log
J=bench_results.jsonl

echo "=== refresh-c start $(date)" >> $LOG

timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype float32 \
  --instances gen-instML1M,instML100k --jsonl $J >> $LOG 2>&1

timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype bfloat16 \
  --instances gen-instML1M,instML100k --jsonl $J >> $LOG 2>&1

timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype float32 \
  --instances inst50000-5000-100-2-5,inst400-50000-30-200-500,gen-inst1000-100000-20-1-3,gen-inst100000-1000-20-1-3 \
  --jsonl $J >> $LOG 2>&1

timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype float32 \
  --instances gen-inst1000-80000-20-10-1000,gen-inst20000-10000-40-2-50,gen-inst60000-2000-200-10-20 \
  --jsonl $J >> $LOG 2>&1

echo "=== refresh-c done $(date)" >> $LOG
