#!/bin/sh
# Production launch surface (reference run.sh equivalent).
# On TPU the device mesh replaces CUDA_VISIBLE_DEVICES; dp_shards=0 uses all
# local chips.
set -e

python train.py @configs/train_cfpnet_combine1.txt
python evaluate_all.py @configs/train_cfpnet_combine1.txt --selected_epoch best --test_dataset nyu
python evaluate_all.py @configs/train_cfpnet_combine1.txt --selected_epoch best --test_dataset zjuL5
