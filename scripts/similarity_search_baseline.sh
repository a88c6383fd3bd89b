#!/bin/bash
# Classical baselines on cross-graph similarity search
# (reference scripts/similarity_search/baseline.sh equivalent).
# Usage: bash scripts/similarity_search_baseline.sh <model> <ds1_ds2> [...]
set -e
MODEL=$1
shift
for PAIR in "$@"; do
  python -m gcc_tpu.cli eval-sim --dataset "$PAIR" --model "$MODEL"
done
