#!/bin/bash
# Round-4 follow-up: the encodec eval -n 32 row crashed on a Pallas RVQ
# scoped-VMEM OOM (16.8 MB codebook stack > 16 MB limit); rerun with the
# staged-grid kernel once the remat A/B queue drains the chip.
set -u
cd /root/repo
while ! grep -q "remat queue done" /tmp/r4_remat_queue.log 2>/dev/null; do
    sleep 60
done
echo "=== eval32 rerun start: $(date) ==="
CKPT=$(ls -t logs/synth_encodec/*.ckpt.npz 2>/dev/null | head -1)
timeout 3600 python eval.py -c logs/synth_encodec/config.yaml \
    --ckpt "$CKPT" -i data/synth/eval -n 32 \
    > logs/r4_encodec_eval32.log 2>&1
echo "encodec eval n=32 ckpt=$CKPT rc=$? $(date)"
echo "=== eval32 rerun done: $(date) ==="
