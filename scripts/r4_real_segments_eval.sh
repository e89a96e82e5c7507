#!/bin/bash
# Round-4: upgrade the n=1 real-audio anchor row to a CI — the reference's
# 30 s golden speech wav split into 15 x 2 s segments, scored with the full
# in-env metric set through the synth-trained speech checkpoint.
# Waits for the bench chain to drain the chip.
set -u
cd /root/repo
while ! grep -q "bench chain done" /tmp/r4_benchchain.log 2>/dev/null; do
    sleep 60
done
echo "=== real segments eval start: $(date) ==="
timeout 2400 python eval.py -c logs/synth/config.yaml \
    --ckpt logs/synth/00025.ckpt.npz -i data/real_segments -n 8 \
    -m stoi,sisdr,mcd > logs/r4_real_segments_eval.log 2>&1
echo "real segments eval rc=$? $(date)"
tail -5 logs/r4_real_segments_eval.log
echo "=== real segments eval done: $(date) ==="
