#!/bin/bash
# Round-5 follow-up TPU queue (after r5_tpu_queue.sh):
#   9.  finish kuaishou gru4rec seeds 4,5 (stage 7 OOM-killed at run 8 —
#       fresh process, done-keys skip the 7 recorded runs)
#   10. bf16 quality cell re-run (the Mosaic bf16 kernel fix landed)
#   11. bucketed quality cell WITH mask-aware BN stats (bn_stats_mask
#       auto; fresh tag) — the fix for the -14pt collapse
#   12. final bench.py (bucketed default) for the record
set -u
cd /root/repo
OUT=/tmp/quality_r5
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/r5_queue.log; }

stage=8
run() {
  local name=$1 to=$2; shift 2
  stage=$((stage+1))
  log "stage $stage START $name"
  timeout "$to" "$@" > /tmp/r5_${name}.out 2> /tmp/r5_${name}.err
  log "stage $stage DONE $name exit=$?"
}

run kuaishou2 7200 python scripts/quality_tournament.py \
  --scale kuaishou --seeds 4,5 --models gru4rec --epochs 8 --out $OUT

run bf16b 10800 python scripts/quality_tournament.py \
  --scale taobao_bimodal --seeds 3,4,5,6,7 --models clsr --epochs 10 \
  --extra '{"compute_dtype": "bfloat16", "embedding_dtype": "bfloat16"}' \
  --tag bf16 --out $OUT

run buckets2 10800 python scripts/quality_tournament.py \
  --scale taobao_bimodal --seeds 3,4,5,6,7 --models clsr --epochs 10 \
  --extra '{"resident_data": "on", "length_buckets": "16,24", "resident_round_rows": 8192}' \
  --tag buckets2 --out $OUT

run bench_final 3600 python bench.py

log "queue2 complete"
