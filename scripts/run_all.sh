#!/usr/bin/env bash
# Experiment harness parity with the reference's run_all.sh / run_old/:
# full-experiment sweep over the model zoo.
set -e
DATASET=${1:-synthetic}
MODELS=${MODELS:-"LightGCN SGL HCCF SHT DHCF HGCN HGNN_HD3 KHGRec"}
for MODEL in $MODELS; do
  python -m hypergraph_diffusion_for_recommendation_tpu.cli \
    --model="$MODEL" --dataset="$DATASET" --experiment=full "$@"
done
