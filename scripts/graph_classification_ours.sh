#!/bin/bash
# Frozen-embedding graph classification
# (reference scripts/graph_classification/ours.sh equivalent).
# Usage: bash scripts/graph_classification_ours.sh <run_dir> <dataset> [...]
set -e
RUN=$1
shift
for DS in "$@"; do
  python -m gcc_tpu.cli eval-graph --dataset "$DS" --emb "$RUN/$DS.npy"
done
