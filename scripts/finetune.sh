#!/bin/bash
# 10-fold CV finetune (reference scripts/finetune.sh equivalent;
# per-dataset epoch map: rdt-* get 100 epochs, others 30).
# Usage: bash scripts/finetune.sh <ckpt_path> <dataset>
set -e
CKPT=$1
DS=$2
EPOCHS=30
case "$DS" in rdt-*) EPOCHS=100;; esac
python -m gcc_tpu.cli finetune --ckpt "$CKPT" --dataset "$DS" \
  --cv --epochs "$EPOCHS"
