#!/usr/bin/env bash
# Downstream fine-tune / linear probe (reference surface:
# slurm_submit/submit_job_downstream_*.sh).
# Usage: DATASET=cq500 LABEL=ICH ./scripts/launch_downstream.sh [--lock] [--lora] ...
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONFAULTHANDLER=1
DATASET="${DATASET:-cq500}"
LABEL="${LABEL:-ICH}"
python main_downstream.py \
  --cfg "configs/downstream/vit_HeadCT_${DATASET}.yaml" \
  --local_rank 0 \
  --dataset "$DATASET" \
  --label_name "$LABEL" \
  "$@"
