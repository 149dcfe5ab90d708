#!/usr/bin/env bash
# run_missing/*.sh parity: missing-data robustness sweep.
set -e
DATASET=${1:-synthetic}; MODEL=${2:-HGNN_HD3}
for PCT in 10 20 30 40 50; do
  python -m hypergraph_diffusion_for_recommendation_tpu.cli \
    --model="$MODEL" --dataset="$DATASET" --experiment=missing --missing_pct=$PCT
done
