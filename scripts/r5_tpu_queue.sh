#!/bin/bash
# Round-5 TPU measurement queue (one TPU process at a time; every cell
# is idempotent — tournament.jsonl done-keys skip completed runs).
# Usage: bash scripts/r5_tpu_queue.sh [start_stage]
set -u
cd /root/repo
OUT=/tmp/quality_r5
mkdir -p $OUT
START=${1:-0}

log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/r5_queue.log; }

stage=0
run() {   # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  stage=$((stage+1))
  if [ $stage -lt $START ]; then log "skip stage $stage $name"; return; fi
  log "stage $stage START $name"
  timeout "$to" "$@" > /tmp/r5_${name}.out 2> /tmp/r5_${name}.err
  log "stage $stage DONE $name exit=$?"
}

# 1. protocol-exact 99-ngs bimodal (headline cells at the reference's
#    exact protocol — VERDICT r4 item 3a)
run cell1 14400 python scripts/quality_tournament.py \
  --scale taobao_bimodal --seeds 3,4,5,6,7 --models clsr,dien,sli_rec \
  --epochs 10 --test_num_ngs 99 --out $OUT

# 2. serving attribution + async (VERDICT r4 item 2)
run serving 3600 python scripts/bench_serving.py

# 3. bucketed-vs-flat train throughput A/B (VERDICT r4 item 1)
run buckets 5400 python scripts/bench_buckets.py

# 4. bf16 quality cell + its paired f32 arm (VERDICT r4 item 5)
run bf16_f32 10800 python scripts/quality_tournament.py \
  --scale taobao_bimodal --seeds 3,4,5,6,7 --models clsr --epochs 10 --out $OUT
run bf16 10800 python scripts/quality_tournament.py \
  --scale taobao_bimodal --seeds 3,4,5,6,7 --models clsr --epochs 10 \
  --extra '{"compute_dtype": "bfloat16", "embedding_dtype": "bfloat16"}' \
  --tag bf16 --out $OUT

# 5. bucketed-training quality cell (VERDICT r4 item 1: in-batch
#    negatives now draw from length-correlated rows — paired GAUC cell)
# explicit edges (the auto choice on this population's seed-3 histogram:
# [16, 24, top]) so every seed shares the same compiled bucket programs
run buckets_q 10800 python scripts/quality_tournament.py \
  --scale taobao_bimodal --seeds 3,4,5,6,7 --models clsr --epochs 10 \
  --extra '{"resident_data": "on", "length_buckets": "16,24", "resident_round_rows": 8192}' \
  --tag buckets --out $OUT

# 6. kuaishou-scale (L=250) tournament row (VERDICT r4 item 3b)
run kuaishou 14400 python scripts/quality_tournament.py \
  --scale kuaishou --seeds 3,4,5 --models clsr,dien,gru4rec \
  --epochs 8 --out $OUT

# 7. zoo breadth: Caser/A2SVD/NCF vs clsr (VERDICT r4 item 3c)
run zoo 14400 python scripts/quality_tournament.py \
  --scale taobao --seeds 3,4,5 --models clsr,caser,a2svd,ncf \
  --epochs 10 --out $OUT

log "queue complete"
