#!/bin/bash
# MoCo pretrain at the canonical config (reference README.md:79-83).
# Usage: bash scripts/pretrain_moco.sh <corpus_dir> [extra flags...]
set -e
CORPUS=${1:-data/corpus}
shift || true
python -m gcc_tpu.cli pretrain --corpus "$CORPUS" --out saved \
  --exp Pretrain --moco --nce-k 16384 "$@"
