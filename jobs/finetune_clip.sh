#!/bin/bash
# ARP-DT+ CLIP fine-tuning launcher (parity with finetune_module usage).
DATASET=${1:-coinrun_hard_level0to500_num500_frame8}
DATA_PATH=${2:-./demonstrations}
python3 -m arp_tpu.finetune.train \
    --dataset_name="$DATASET" \
    --data.path="$DATA_PATH" \
    --epochs=10 --batch_size=32 --lr=1e-4 \
    --checkpoint_dir="./checkpoints/clip_ft_${DATASET}"
