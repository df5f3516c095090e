#!/usr/bin/env bash
# DINO pretraining launch (reference surface: slurm_submit/submit_job_dino.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONFAULTHANDLER=1
python main_pretrain_dino.py \
  --cfg configs/dino/dino_HeadCT.yaml \
  --local_rank 0 \
  --batch_size "${BATCH_SIZE:-64}" \
  "$@"
