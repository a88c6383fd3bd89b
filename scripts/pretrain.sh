#!/bin/bash
# Pretrain on the corpus (reference scripts/pretrain.sh equivalent).
# Usage: bash scripts/pretrain.sh <corpus_dir> [extra flags...]
set -e
CORPUS=${1:-data/corpus}
shift || true
python -m gcc_tpu.cli pretrain --corpus "$CORPUS" --out saved \
  --exp Pretrain "$@"
