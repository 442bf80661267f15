#!/bin/bash
# Round-2 continuation: refresh bench rows affected by the grid-streamed
# kernel (+int8 A storage) and the BELL re-gather flip.  Groups run in
# their own processes (x64 is process-global; extreme shapes want a
# fresh HBM arena).  Logs append to /tmp/tpu_refresh.log.
set -x
cd /root/repo
LOG=/tmp/tpu_refresh.log
J=bench_results.jsonl

echo "=== refresh start $(date)" >> $LOG

# 1. The stream-plan instances: gen-ML1M (14.5s fori row -> expect ~2s)
#    and the resident/int8-affected small set incl. ML100k re-check.
timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype float32 \
  --instances gen-instML1M,instML100k --jsonl $J >> $LOG 2>&1

# 2. bf16 rows through the new plan (stream bf16-1pass = 0.25 ms/iter).
timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype bfloat16 \
  --instances gen-instML1M,instML100k --jsonl $J >> $LOG 2>&1

# 3. BELL f32 rows, re-gather now ON (committed rows predate the flip).
timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype float32 \
  --instances inst50000-5000-100-2-5,inst400-50000-30-200-500,gen-inst1000-100000-20-1-3,gen-inst100000-1000-20-1-3 \
  --jsonl $J >> $LOG 2>&1
timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype float32 \
  --instances gen-inst1000-80000-20-10-1000,gen-inst20000-10000-40-2-50,gen-inst60000-2000-200-10-20 \
  --jsonl $J >> $LOG 2>&1

# 4. Extreme shapes, own processes (HBM-edge; chunked path unchanged by
#    the re-gather gate, so this is a confirmation of no regression).
timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype float32 \
  --instances inst1000-1e6-1000-1-3 --jsonl $J >> $LOG 2>&1
timeout 3000 python -u -m recsys_tpu.bench.sweep --dtype float32 \
  --instances gen-inst1e6-100-700-1-3 --jsonl $J >> $LOG 2>&1

# 5. headline bench sanity + markdown re-render.
timeout 1800 python -u bench.py >> $LOG 2>&1
python -m recsys_tpu.bench.sweep --render $J --out BENCHMARKS.md >> $LOG 2>&1

echo "=== refresh done $(date)" >> $LOG
