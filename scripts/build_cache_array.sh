#!/usr/bin/env bash
# Sharded offline cache build (reference surface: run_cache_data.py's Slurm
# array). Works under any array scheduler: pass the shard index via
# SHARD / SLURM_ARRAY_TASK_ID.
set -euo pipefail
cd "$(dirname "$0")/.."
SHARD="${SHARD:-${SLURM_ARRAY_TASK_ID:-0}}"
NUM_SHARDS="${NUM_SHARDS:-1}"
python tools/build_cache.py \
  --csv "${CSV:?set CSV=manifest.csv}" \
  --cache-dir "${CACHE_DIR:?set CACHE_DIR=...}" \
  --shard "$SHARD" --num-shards "$NUM_SHARDS" "$@"
