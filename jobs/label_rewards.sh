#!/bin/bash
# Reward labeling launcher (parity with the reference README stage 2).
ENV_NAME=${1:-coinrun}
ENV_TYPE=${2:-none}
DATA_PATH=${3:?path to data.hdf5}
MODEL_TYPE=${4:-clip}
MODEL_CKPT_DIR=${5:-}   # required for clip_ft* model types (adapter ckpt)
shift $(( $# < 5 ? $# : 5 ))

EXTRA=()
if [ -n "$MODEL_CKPT_DIR" ]; then
    EXTRA+=(--model_ckpt_dir="$MODEL_CKPT_DIR")
fi

python3 -m arp_tpu.reward.labeler \
    --env_name="$ENV_NAME" \
    --env_type="$ENV_TYPE" \
    --data_path="$DATA_PATH" \
    --model_type="$MODEL_TYPE" \
    --batch_size=256 --bf16 "${EXTRA[@]}" "$@"
