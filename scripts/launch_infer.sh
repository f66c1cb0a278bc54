#!/bin/bash
# Batched test-set inference (reference script/infer.sh). No ZeRO-shard
# conversion step is needed: orbax checkpoints and reference-format adapter
# weights both load directly (io/torch_bridge.load_adapter_checkpoint).
set -e
cd "$(dirname "$0")/.."

python scripts/infer.py \
    --basemodel UniGenFlux \
    --pretrained_model_name_or_path "$PRETRAIN_MODEL_PATH" \
    --ckpt_path "${CKPT_PATH:-}" \
    --data_path "$DATAPATH" \
    --save_path "${SAVE_PATH:-output/infer}" \
    --condition_types ${CONDITION_TYPE:-canny} \
    --num_inference_steps "${STEPS:-4}" \
    --guidance_scale "${CFG:-3.5}" \
    --resolution "${RES:-512}" \
    "$@"
