#!/usr/bin/env bash
# run_old/run_coldstart*.sh parity: user-degree-quartile cold-start groups.
set -e
DATASET=${1:-synthetic}; MODEL=${2:-HGNN_HD3}
for G in 1 2 3 4; do
  python -m hypergraph_diffusion_for_recommendation_tpu.cli \
    --model="$MODEL" --dataset="$DATASET" --experiment=cold_start --group_id=$G
done
