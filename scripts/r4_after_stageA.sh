#!/bin/bash
# Round-4 chip pipeline after stage A: waits for train_round4.sh to finish,
# then runs (1) the streaming-perf queue, (2) the LM entropy-coded
# bitstream measurement on the trained speech codec, (3) the real-audio
# smoke eval on the reference's input_speech.wav, (4) stage B (avocodo +
# trainer-swap ablation). Keeps the single chip busy end-to-end.
set -u
cd /root/repo
mkdir -p logs

echo "waiting for stage A... $(date)"
while ! grep -q "stage A complete" /tmp/r4_stageA.log 2>/dev/null; do
    sleep 60
done
echo "stage A done: $(date)"

echo "=== perf queue: $(date) ==="
bash scripts/perf_round4.sh
echo "perf rc=$? $(date)"

if [ -f logs/synth/00025.ckpt.npz ]; then
    echo "=== entropy-coded bitstream (speech tokens): $(date) ==="
    LM_CKPT=$(ls -t logs/synth_lm/*.ckpt.npz 2>/dev/null | head -1)
    if [ -n "$LM_CKPT" ]; then
        timeout 3600 python scripts/entropy_code.py \
            -c logs/synth/config.yaml --ckpt logs/synth/00025.ckpt.npz \
            --lm "$LM_CKPT" -i data/synth/eval/e000.wav \
            --out logs/eval0.hilstream > logs/r4_entropy_code.log 2>&1
        echo "entropy_code synth rc=$? $(date)"
        timeout 7200 python scripts/entropy_code.py \
            -c logs/synth/config.yaml --ckpt logs/synth/00025.ckpt.npz \
            --lm "$LM_CKPT" -i /root/reference/onnx/input_speech.wav \
            --out logs/input_speech.hilstream \
            > logs/r4_entropy_code_real.log 2>&1
        echo "entropy_code real rc=$? $(date)"
    else
        echo "no LM checkpoint found; skipping entropy_code"
    fi

    echo "=== real-audio smoke (reference input_speech.wav): $(date) ==="
    timeout 1800 python eval.py -c logs/synth/config.yaml \
        --ckpt logs/synth/00025.ckpt.npz \
        -i /root/reference/onnx/input_speech.wav --verbose \
        > logs/r4_real_audio_eval.log 2>&1
    echo "real-audio eval rc=$? $(date)"
fi

echo "=== stage B: $(date) ==="
bash scripts/train_round4b.sh
echo "stage B rc=$? $(date)"
echo "=== r4 chip pipeline complete: $(date) ==="
