#!/bin/bash
# Classical baselines on node classification
# (reference scripts/node_classification/baseline.sh equivalent).
# Usage: bash scripts/node_classification_baseline.sh <model> <dataset> [...]
set -e
MODEL=$1
shift
for DS in "$@"; do
  python -m gcc_tpu.cli eval-node --dataset "$DS" --model "$MODEL"
done
