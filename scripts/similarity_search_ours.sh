#!/bin/bash
# Cross-graph similarity search (reference scripts/similarity_search/ours.sh).
# Usage: bash scripts/similarity_search_ours.sh <run_dir> <ds1_ds2> [...]
set -e
RUN=$1
shift
for PAIR in "$@"; do
  D1=${PAIR%%_*}
  D2=${PAIR##*_}
  python -m gcc_tpu.cli eval-sim --dataset "$PAIR" \
    --emb1 "$RUN/$D1.npy" --emb2 "$RUN/$D2.npy"
done
