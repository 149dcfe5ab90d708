#!/bin/bash
# Serial TPU work queue: starts when the parity rebuild (pid $1) exits.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 20; done
echo "=== queue start $(date) ==="
echo "--- tune_khgrec_bench ---"
timeout 9000 python scripts/tune_khgrec_bench.py --max_epoch 300 > parity/tune.out 2>&1
echo "--- probe_layouts ---"
timeout 7200 python scripts/probe_layouts.py --epochs 5 > parity/probe_layouts.out 2>&1
echo "--- converter full (with CLI train) ---"
timeout 1800 python scripts/converter_scale_check.py > parity/converter.out 2>&1
echo "--- eval overlap real chip ---"
timeout 1800 python scripts/eval_overlap_mesh.py --real_chip --epochs 3 > parity/overlap_real.out 2>&1
echo "=== queue done $(date) ==="
