#!/bin/bash
# Final TPU stage: after the cold-start matrix (pid $1): long tune, then bench smoke.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 20; done
echo "=== queue4 start $(date) ==="
timeout 5400 python scripts/tune_khgrec_bench.py --trials long --max_epoch 800 --early_stopping_steps 400 --evaluate_every 4 > parity/tune_long.out 2>&1
echo "--- bench smoke ---"
timeout 1500 python bench.py --epochs 30 > parity/bench_smoke.out 2>&1
echo "rc=$?"
echo "=== queue4 done $(date) ==="
