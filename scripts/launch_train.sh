#!/bin/bash
# Multi-host TPU training launch (replaces the reference's accelerate/
# DeepSpeed rendezvous plumbing, script/train.sh). Run ONE copy per host,
# e.g. via `gcloud compute tpus tpu-vm ssh --worker=all` or xpk.
#
# Required env:
#   PRETRAIN_MODEL_PATH  FLUX.1 checkpoint dir (diffusers layout)
#   DATAPATH             dataset root
#   WORKDIR              output/checkpoint dir
#   CONDITION_TYPE       e.g. "canny" or "depth canny"
# Multi-host env (single-host runs can omit all three):
#   COORDINATOR          host:port of process 0
#   NUM_PROCESSES        total host count
#   PROCESS_ID           this host's index
set -e
cd "$(dirname "$0")/.."

TRAIN_STEPS=${TRAIN_STEPS:-30000}
BATCH=${BATCH:-16}

python scripts/train.py \
    --basemodel UniGenFlux \
    --pretrained_model_name_or_path "$PRETRAIN_MODEL_PATH" \
    --data_path "$DATAPATH" \
    --work_dir "$WORKDIR" \
    --condition_types $CONDITION_TYPE \
    --guidance_scale 3.5 \
    --checkpointing_steps 1000 \
    --max_train_steps "$TRAIN_STEPS" \
    --train_batch_size "$BATCH" \
    ${COORDINATOR:+--coordinator "$COORDINATOR"} \
    ${NUM_PROCESSES:+--num-processes "$NUM_PROCESSES"} \
    ${PROCESS_ID:+--process-id "$PROCESS_ID"} \
    "$@"
