#!/bin/bash
# Round-4: the missing EnCodec trained-quality row (VERDICT r3 item 2).
# Resumes from the snapshotted config (run dir exists, no ckpt -> fresh).
set -u
cd /root/repo
echo "=== encodec chain start: $(date) ==="
timeout 10000 python train.py -n synth_encodec > logs/r4_encodec.log 2>&1
echo "encodec train rc=$? $(date)"
CKPT=$(ls -t logs/synth_encodec/*.ckpt.npz 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
    for n in 8 32; do
        timeout 1800 python eval.py -c logs/synth_encodec/config.yaml \
            --ckpt "$CKPT" -i data/synth/eval -n $n \
            > logs/r4_encodec_eval$n.log 2>&1
        echo "encodec eval n=$n ckpt=$CKPT rc=$? $(date)"
    done
fi
echo "=== encodec chain done: $(date) ==="
