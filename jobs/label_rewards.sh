#!/bin/bash
# Reward labeling launcher (parity with the reference README stage 2).
ENV_NAME=${1:-coinrun}
ENV_TYPE=${2:-none}
DATA_PATH=${3:?path to data.hdf5}
MODEL_TYPE=${4:-clip}

python3 -m arp_tpu.reward.labeler \
    --env_name="$ENV_NAME" \
    --env_type="$ENV_TYPE" \
    --data_path="$DATA_PATH" \
    --model_type="$MODEL_TYPE" \
    --batch_size=256 --bf16
