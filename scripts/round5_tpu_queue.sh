#!/bin/sh
# Round-5 TPU work queue (VERDICT r4 items #1, #2, #5, #6), in value order.
# Run when the axon tunnel is back: sh scripts/round5_tpu_queue.sh
# Each step is independently resumable; artifacts land in the repo root /
# docs. Probe first; the tunnel can hang for hours (CLAUDE.md gotchas).
set -x
cd "$(dirname "$0")/.."

# 0. probe (60 s bound; rc!=0 => tunnel still down, stop)
timeout 90 python -c "import jax, jax.numpy as jnp; \
jax.block_until_ready(jnp.ones((128,128)) @ jnp.ones((128,128))); \
print('tpu ok', jax.devices())" || exit 1

# 1. learning-quality artifact (VERDICT #1) — ~40-60 min
test -f learning_quality.json || \
  timeout 7200 python scripts/learning_quality.py \
    --epochs 200 --out learning_quality.json 2>&1 | tail -40

# 2. perf matrix (VERDICT #2) — ~15-25 min
test -f BENCH_MATRIX.json || \
  timeout 3600 python scripts/bench_matrix.py --out BENCH_MATRIX.json

# 3. batch-1536 sub-linearity root-cause (VERDICT weak #6)
test -f /tmp/pb_768.txt || \
  timeout 1800 python scripts/profile_breakdown.py --batch 768 \
    > /tmp/pb_768.txt 2>&1
test -f /tmp/pb_1536.txt || \
  timeout 1800 python scripts/profile_breakdown.py --batch 1536 \
    > /tmp/pb_1536.txt 2>&1

# 4. decoder ConvT per-stage ceiling rows (round-4 queued capture)
test -f /tmp/decoder_stages.txt || \
  timeout 1800 python scripts/profile_backward.py --decoder-stages \
    > /tmp/decoder_stages.txt 2>&1

echo QUEUE_DONE
