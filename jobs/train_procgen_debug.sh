#!/bin/bash
# Debug-scale training launcher (parity with the reference
# jobs/train_procgen_debug.sh: the full pipeline at a debug RUN BUDGET —
# 5 epochs, 2 test episodes, 100-step episodes — the reference's stand-in
# for a test suite; here it complements tests/).  Model dims are the
# CLI-effective reference defaults (emb 128 / depth 2; "vit_*" names select
# the DT block mask and keep explicit dims, matching how the reference
# actually runs — see models/policy/models.py module docstring).
#
# usage: sh jobs/train_procgen_debug.sh GAME TRAIN_ENV_TYPE EVAL_ENV_TYPE \
#          SEED NUM_DEMOS DATA_PATH USE_VL VL_TYPE USE_NORMALIZE COMMENT \
#          LAMBDA_RETURN_PRED EVAL_WITH_GOAL

GAME_NAME=${1:-coinrun}
TRAIN_ENV_TYPE=${2:-none}
EVAL_ENV_TYPE=${3:-none}
SEED=${4:-42}
NUM_DEMONSTRATIONS=${5:-500}
DATA_PATH=${6:-./demonstrations}
USE_VL=${7:-True}
VL_TYPE=${8:-clip}
USE_NORMALIZE=${9:-False}
COMMENT=${10:-debug}
LAMBDA_RETURN_PRED=${11:-1.0}
EVAL_WITH_GOAL=${12:-False}

DIST_MODE=hard
START_LEVEL=0
NUM_LEVELS=500
NUM_FRAMES=8
WINDOW_SIZE=4
MODEL_TYPE="vit_base"       # same name the reference debug script passes
TRANSFER_TYPE="m3ae_vit_b16"
USE_ADAPTER=True
BATCH_SIZE=128
EPOCHS=5
TEST_EVERY_EPOCHS=1
LEARNING_RATE=5e-4
NUM_TEST_EPISODES=2
EPISODE_LENGTH=100

python3 -m arp_tpu.train.main \
    --seed="$SEED" \
    --epochs="$EPOCHS" \
    --batch_size="$BATCH_SIZE" \
    --lr="$LEARNING_RATE" \
    --lr_schedule=cos \
    --weight_decay=5e-5 \
    --clip_gradient=10.0 \
    --window_size="$WINDOW_SIZE" \
    --game_name="$GAME_NAME" \
    --use_vl="$USE_VL" \
    --vl_type="$VL_TYPE" \
    --val_every_epochs=1 \
    --test_every_epochs="$TEST_EVERY_EPOCHS" \
    --num_test_episodes="$NUM_TEST_EPISODES" \
    --episode_length="$EPISODE_LENGTH" \
    --eval_env=procgen \
    --eval_with_goal="$EVAL_WITH_GOAL" \
    --env_eval_env_type="$EVAL_ENV_TYPE" \
    --env_distribution_mode="$DIST_MODE" \
    --env_num_levels="$NUM_LEVELS" \
    --env_start_level="$START_LEVEL" \
    --model.model_type="$MODEL_TYPE" \
    --model.transfer_type="$TRANSFER_TYPE" \
    --model.use_adapter="$USE_ADAPTER" \
    --model.lambda_return_pred="$LAMBDA_RETURN_PRED" \
    --data.path="$DATA_PATH" \
    --data.num_demonstrations="$NUM_DEMONSTRATIONS" \
    --data.num_frames="$NUM_FRAMES" \
    --data.window_size="$WINDOW_SIZE" \
    --data.train_env_type="$TRAIN_ENV_TYPE" \
    --data.use_vl="$USE_VL" \
    --data.vl_type="$VL_TYPE" \
    --data.use_normalize="$USE_NORMALIZE" \
    --checkpoint_dir="./checkpoints/${GAME_NAME}_${COMMENT}_debug" \
    --logging.notes="$COMMENT"
