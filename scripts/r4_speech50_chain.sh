#!/bin/bash
# Round-4 budget-scaling run: resume the flagship speech checkpoint from
# epoch 25 to 50 (the reference trains 150 — this measures the quality/
# budget slope on the same synth protocol), then eval with the full
# in-env metric set. Waits for the real-segments eval to drain the chip.
set -u
cd /root/repo
while ! grep -q "real segments eval done" /tmp/r4_realseg.log 2>/dev/null; do
    sleep 60
done
echo "=== speech 25->50 chain start: $(date) ==="
timeout 10000 python train.py -n synth -p train.max_epochs=50 \
    > logs/r4_speech50_train.log 2>&1
echo "speech50 train rc=$? $(date)"
CKPT=$(ls -t logs/synth/*.ckpt.npz 2>/dev/null | head -1)
timeout 2400 python eval.py -c logs/synth/config.yaml --ckpt "$CKPT" \
    -i data/synth/eval -n 8 -m stoi,sisdr,mcd \
    > logs/r4_speech50_eval.log 2>&1
echo "speech50 eval ckpt=$CKPT rc=$? $(date)"
tail -5 logs/r4_speech50_eval.log
echo "=== speech 25->50 chain done: $(date) ==="
