#!/bin/bash
# Round-4 on-chip quality queue, stage A (VERDICT r3 items 2 & 3):
#   1. hilcodec speech 25 epochs  -> eval (STOI CI row)
#   2. encodec 25 epochs          -> eval at n=8 and n=32 (the missing
#      4th-family trained-quality row)
#   3. token-LM entropy model on the trained speech codec's tokens
#      (bits/token vs log2(1024) -> entropy-coded kbps row)
# Stage B (avocodo + the 0.88-vs-0.94 gap ablation) runs separately so
# streaming-perf benches can use the chip between stages.
# Each train resumes from its latest checkpoint if interrupted.
set -u
cd /root/repo
mkdir -p logs

echo "=== hilcodec speech: $(date) ==="
timeout 7200 python train.py -n synth -c configs/hilcodec_speech_synth.yaml \
    > logs/r4_speech.log 2>&1
echo "speech rc=$? $(date)"
timeout 1800 python eval.py -c logs/synth/config.yaml \
    --ckpt logs/synth/00025.ckpt.npz -i data/synth/eval \
    > logs/r4_speech_eval.log 2>&1
echo "speech eval rc=$? $(date)"

echo "=== encodec: $(date) ==="
timeout 10800 python train.py -n synth_encodec -c configs/encodec_synth.yaml \
    > logs/r4_encodec.log 2>&1
echo "encodec rc=$? $(date)"
for n in 8 32; do
    timeout 1800 python eval.py -c logs/synth_encodec/config.yaml \
        --ckpt logs/synth_encodec/00025.ckpt.npz -i data/synth/eval -n $n \
        > logs/r4_encodec_eval$n.log 2>&1
    echo "encodec eval n=$n rc=$? $(date)"
done

echo "=== LM entropy model on speech tokens: $(date) ==="
timeout 7200 python scripts/train_lm.py -c logs/synth/config.yaml \
    --ckpt logs/synth/00025.ckpt.npz --data data/synth --out logs/synth_lm \
    > logs/r4_lm.log 2>&1
echo "lm rc=$? $(date)"
echo "=== stage A complete: $(date) ==="
