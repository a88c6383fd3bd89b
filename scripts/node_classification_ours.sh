#!/bin/bash
# Frozen-embedding node classification for generated embeddings
# (reference scripts/node_classification/ours.sh equivalent).
# Usage: bash scripts/node_classification_ours.sh <run_dir> <dataset> [...]
set -e
RUN=$1
shift
for DS in "$@"; do
  python -m gcc_tpu.cli eval-node --dataset "$DS" --emb "$RUN/$DS.npy"
done
