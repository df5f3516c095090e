#!/usr/bin/env bash
# MAE pretraining launch on a TPU VM (reference surface: slurm_submit/submit_job_mae.sh).
# Single host drives all local chips; for pods, set JAX_COORDINATOR_ADDRESS and
# run this script on every host.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONFAULTHANDLER=1
python main_pretrain_mae.py \
  --cfg configs/mae/mae_HeadCT.yaml \
  --local_rank 0 \
  --batch_size "${BATCH_SIZE:-256}" \
  "$@"
