#!/bin/bash
# Evaluation launcher (parity with the reference jobs/eval_procgen.sh).
#
# The data.* flags MUST match the ones training ran with: the eval driver
# reopens the training dataset to recover return_to_go / scale / reward_min
# (reference local_run_procgen.py:186,299-305), and dataset_dirname is keyed
# on num_demonstrations/num_frames/env_type.
GAME_NAME=${1:-coinrun}
TRAIN_ENV_TYPE=${2:-none}
EVAL_ENV_TYPE=${3:-none}
CHECKPOINT=${4:?checkpoint dir or pickle}
DATA_PATH=${5:-./demonstrations}
USE_VL=${6:-True}
VL_TYPE=${7:-clip}
NUM_EPISODES=${8:-100}
NUM_DEMONSTRATIONS=${9:-500}
USE_NORMALIZE=${10:-False}
EVAL_WITH_GOAL=${11:-False}

NUM_FRAMES=8
WINDOW_SIZE=4

# pickles (reference-format checkpoints) route via --load_checkpoint;
# orbax checkpoint DIRECTORIES via --checkpoint_dir (train/eval.py contract)
if [ -f "$CHECKPOINT" ]; then
    CKPT_FLAG=--load_checkpoint
else
    CKPT_FLAG=--checkpoint_dir
fi

python3 -m arp_tpu.train.eval \
    "$CKPT_FLAG=$CHECKPOINT" \
    --game_name="$GAME_NAME" \
    --env_eval_env_type="$EVAL_ENV_TYPE" \
    --use_vl="$USE_VL" \
    --vl_type="$VL_TYPE" \
    --num_test_episodes="$NUM_EPISODES" \
    --episode_length=500 \
    --eval_env=procgen \
    --eval_with_goal="$EVAL_WITH_GOAL" \
    --window_size="$WINDOW_SIZE" \
    --data.path="$DATA_PATH" \
    --data.num_demonstrations="$NUM_DEMONSTRATIONS" \
    --data.num_frames="$NUM_FRAMES" \
    --data.window_size="$WINDOW_SIZE" \
    --data.train_env_type="$TRAIN_ENV_TYPE" \
    --data.use_vl="$USE_VL" \
    --data.vl_type="$VL_TYPE" \
    --data.use_normalize="$USE_NORMALIZE" \
    --model.model_type=vit_base \
    --model.transfer_type=m3ae_vit_b16 \
    --model.use_adapter=True
