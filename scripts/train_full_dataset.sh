#!/usr/bin/env bash
# Canonical training recipe (parity: EE/train_full_dataset.sh:3-9):
# 60 epochs, global batch 48 (2 x 24 accumulation), lr 2e-5, gamma 0.7,
# ramp heads, one_stage_subgraphs_weighted, exits text_avg,vision_avg,7.
set -euo pipefail
DATASET=${1:-rvl_cdip}
EXITS=${2:-text_avg,vision_avg,7}

python -m multi_modal_early_exit_tpu.cli.train with layoutlmv3 \
    model=EElayoutlmv3 "dataset=${DATASET}" epochs=60 batch_size=2 \
    gradient_accumulation_steps=24 lr=2e-5 gamma=0.7 \
    encoder_layer_strategy=ramp training_strategy=one_stage_subgraphs_weighted \
    "exits=${EXITS}" compute_dtype=bfloat16
