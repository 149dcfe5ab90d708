#!/bin/bash
# Stage 2: waits for tpu_queue.sh (pid $1) to exit, then runs the
# rebuild parity side (pinned flags) and the robustness matrix.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "=== queue2 start $(date) ==="
echo "--- rebuild parity (pinned effective configs) ---"
timeout 7200 python scripts/run_parity.py --side rebuild --models MF,LightGCN,HCCF,SGL,SHT,DHCF,KGAT,KHGRec,HGNN,HGNN_HD3 --max_epoch 80 --early_stopping_steps 15 > parity/rebuild_side.out 2>&1
echo "--- robustness matrix (synthetic via shared parity dataset) ---"
timeout 10800 python scripts/run_reference_matrix.py --data_dir parity/sandbox/dataset --dataset lastfm --models LightGCN,HCCF,SGL,SHT,DHCF,KGAT,KHGRec,HGNN --experiments cold_start,missing,add_noise --percentages 10,30,50 --max_epoch 30 --out results/reference_matrix_synthetic > parity/matrix.out 2>&1
echo "=== queue2 done $(date) ==="
