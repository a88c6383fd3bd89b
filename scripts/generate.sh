#!/bin/bash
# Generate frozen embeddings for a list of datasets
# (reference scripts/generate.sh equivalent).
# Usage: bash scripts/generate.sh <ckpt_path> <dataset> [<dataset> ...]
set -e
CKPT=$1
shift
for DS in "$@"; do
  python -m gcc_tpu.cli generate --ckpt "$CKPT" --dataset "$DS"
done
