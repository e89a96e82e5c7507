#!/bin/bash
# Round-4 remat A/B queue: waits for the encodec chain to drain, then
# measures jax.checkpoint policies on the HBM-bound train step
# (BASELINE r3: 197 GB/step at 75% of HBM peak; remat trades residual
# round-trips for recompute FLOPs, which are 3x cheaper than bytes here).
set -u
cd /root/repo
while ! grep -q "encodec chain done" /tmp/r4_enc_chain.log 2>/dev/null; do
    sleep 60
done
echo "=== remat queue start: $(date) ==="
for mode in none disc gen mel all; do
    echo "--- remat=$mode bf16 B=24" | tee -a logs/r4_remat.log
    timeout 2400 python scripts/bench_train_step.py bf16 24 \
        --remat=$mode >> logs/r4_remat.log 2>&1
    echo "remat=$mode rc=$? $(date)"
done
# winner check at B=48 happens manually after reading logs/r4_remat.log
echo "=== remat queue done: $(date) ==="
