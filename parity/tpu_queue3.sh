#!/bin/bash
# Stage 3: waits for queue2 (pid $1), then the long-convergence tune.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "=== queue3 start $(date) ==="
timeout 7200 python scripts/tune_khgrec_bench.py --trials long --max_epoch 800 --early_stopping_steps 400 --evaluate_every 4 > parity/tune_long.out 2>&1
echo "=== queue3 done $(date) ==="
