#!/bin/bash
# Evaluation launcher (parity with jobs/eval_procgen.sh).
GAME_NAME=${1:-coinrun}
EVAL_ENV_TYPE=${2:-none}
CHECKPOINT=${3:?checkpoint dir or pickle}
DATA_PATH=${4:-./demonstrations}
VL_TYPE=${5:-clip}
NUM_EPISODES=${6:-100}

python3 -m arp_tpu.train.eval \
    --checkpoint_dir="$CHECKPOINT" \
    --game_name="$GAME_NAME" \
    --env_eval_env_type="$EVAL_ENV_TYPE" \
    --vl_type="$VL_TYPE" \
    --num_test_episodes="$NUM_EPISODES" \
    --episode_length=500 \
    --eval_env=procgen \
    --data.path="$DATA_PATH" \
    --model.model_type=vit_base \
    --model.transfer_type=m3ae_vit_b16
