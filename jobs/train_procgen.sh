#!/bin/bash
# Policy training launcher (parity with the reference jobs/train_procgen.sh
# positional interface).  Any flags AFTER the 12 positionals are forwarded to
# arp_tpu.train.main verbatim — that is how the TPU mesh/perf knobs are set,
# e.g.: ... EVAL_WITH_GOAL --mesh_fsdp=2 --mesh_tp=2 --accum_steps=4
#
# usage: sh jobs/train_procgen.sh GAME TRAIN_ENV_TYPE EVAL_ENV_TYPE SEED \
#          NUM_DEMOS DATA_PATH USE_VL VL_TYPE USE_NORMALIZE COMMENT \
#          LAMBDA_RETURN_PRED EVAL_WITH_GOAL [extra --flags ...]

GAME_NAME=${1:-coinrun}
TRAIN_ENV_TYPE=${2:-none}
EVAL_ENV_TYPE=${3:-none}
SEED=${4:-42}
NUM_DEMONSTRATIONS=${5:-500}
DATA_PATH=${6:-./demonstrations}
USE_VL=${7:-True}
VL_TYPE=${8:-clip}
USE_NORMALIZE=${9:-False}
COMMENT=${10:-run}
LAMBDA_RETURN_PRED=${11:-1.0}
EVAL_WITH_GOAL=${12:-False}
shift $(( $# < 12 ? $# : 12 ))

DIST_MODE=hard
START_LEVEL=0
NUM_LEVELS=500
NUM_FRAMES=8
WINDOW_SIZE=4
MODEL_TYPE="vit_base"
TRANSFER_TYPE="m3ae_vit_b16"
USE_ADAPTER=True
BATCH_SIZE=128
EPOCHS=50
TEST_EVERY_EPOCHS=20
LEARNING_RATE=5e-4
NUM_TEST_EPISODES=10
EPISODE_LENGTH=500

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
    --val_every_epochs=10 \
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
    --checkpoint_dir="./checkpoints/${GAME_NAME}_${COMMENT}" \
    --logging.notes="$COMMENT" \
    "$@"
