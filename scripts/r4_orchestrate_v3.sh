#!/bin/bash
# Round-4 chip orchestrator v3: the tail of v2 (encodec onward), launched
# after the perf + frames/chunks queues drain. Changes vs v2:
#   * evals use the LATEST checkpoint of each run (a run cut short by the
#     round boundary still yields a quality row instead of a missing-file
#     error on the hardcoded 00025)
#   * the time-permitting vanilla-avocodo rerun is dropped (round-3's
#     0.8814 row is the comparator; the clock goes to the ablation)
set -u
cd /root/repo
mkdir -p logs

latest_ckpt() {  # latest_ckpt RUNDIR -> path or empty
    ls -t "$1"/*.ckpt.npz 2>/dev/null | grep -v lm | head -1
}

echo "=== v3 start: $(date) ==="

echo "=== encodec: $(date) ==="
timeout 10800 python train.py -n synth_encodec -c configs/encodec_synth.yaml \
    > logs/r4_encodec.log 2>&1
echo "encodec rc=$? $(date)"
ENC_CKPT=$(latest_ckpt logs/synth_encodec)
if [ -n "$ENC_CKPT" ]; then
    for n in 8 32; do
        timeout 1800 python eval.py -c logs/synth_encodec/config.yaml \
            --ckpt "$ENC_CKPT" -i data/synth/eval -n $n \
            > logs/r4_encodec_eval$n.log 2>&1
        echo "encodec eval n=$n ckpt=$ENC_CKPT rc=$? $(date)"
    done
fi

echo "=== LM entropy model on speech tokens: $(date) ==="
timeout 7200 python scripts/train_lm.py -c logs/synth/config.yaml \
    --ckpt logs/synth/00025.ckpt.npz --data data/synth --out logs/synth_lm \
    > logs/r4_lm.log 2>&1
echo "lm rc=$? $(date)"

LM_CKPT=$(ls -t logs/synth_lm/*.ckpt.npz 2>/dev/null | head -1)
if [ -n "$LM_CKPT" ]; then
    echo "=== entropy-coded bitstream: $(date) ==="
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
fi

echo "=== real-audio smoke (reference input_speech.wav): $(date) ==="
timeout 1800 python eval.py -c logs/synth/config.yaml \
    --ckpt logs/synth/00025.ckpt.npz \
    -i /root/reference/onnx/input_speech.wav --verbose \
    > logs/r4_real_audio_eval.log 2>&1
echo "real-audio eval rc=$? $(date)"

echo "=== ablation: avocodo generator under hilcodec trainer: $(date) ==="
timeout 10800 python train.py -n synth_avo_hiltrainer \
    -c configs/avocodo_synth_hiltrainer.yaml \
    > logs/r4_avo_hiltrainer.log 2>&1
echo "ablation rc=$? $(date)"
ABL_CKPT=$(latest_ckpt logs/synth_avo_hiltrainer)
if [ -n "$ABL_CKPT" ]; then
    timeout 1800 python eval.py -c logs/synth_avo_hiltrainer/config.yaml \
        --ckpt "$ABL_CKPT" -i data/synth/eval \
        > logs/r4_avo_hiltrainer_eval.log 2>&1
    echo "ablation eval ckpt=$ABL_CKPT rc=$? $(date)"
fi
echo "=== r4 orchestrator v3 complete: $(date) ==="
