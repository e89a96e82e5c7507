#!/bin/bash
# Round-4 chip orchestrator v4: runs after v3 (ablation) drains.
#   1. depthwise "shift" streaming A/B — the round-4 shapes probe showed
#      XLA's grouped-conv lowering burns 83-298 us on ops that are k
#      VPU FMAs; this is the plateau-break candidate.
#   2. encodec 25-epoch run (v3's died on a transient remote-compile
#      disconnect) + evals at n=8/32.
#   3. re-run the three v3 failures with their fixes: entropy_code synth
#      (numpy-params tracer bug), entropy_code real + real-audio eval
#      (length-scaled batch program blew the compile request limit; both
#      now stream long inputs).
set -u
cd /root/repo
mkdir -p logs

latest_ckpt() { ls -t "$1"/*.ckpt.npz 2>/dev/null | grep -v lm | head -1; }

echo "=== v4 start: $(date) ==="

echo "--- depthwise shift A/B f32" | tee -a logs/r4_perf.log
timeout 2400 python bench.py 128 --depthwise shift >> logs/r4_perf.log 2>&1
echo "dwshift f32 rc=$? $(date)"
echo "--- depthwise shift + bf16w" | tee -a logs/r4_perf.log
timeout 2400 python bench.py 128 --depthwise shift --dtype bf16w \
    >> logs/r4_perf.log 2>&1
echo "dwshift bf16w rc=$? $(date)"
echo "--- depthwise shift single-stream" | tee -a logs/r4_perf.log
timeout 2400 python bench.py 1 --depthwise shift --no-megakernel \
    >> logs/r4_perf.log 2>&1
echo "dwshift 1-stream rc=$? $(date)"

echo "=== encodec retry: $(date) ==="
timeout 9000 python train.py -n synth_encodec -c configs/encodec_synth.yaml \
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

LM_CKPT=$(ls -t logs/synth_lm/*.ckpt.npz 2>/dev/null | head -1)
if [ -n "$LM_CKPT" ]; then
    echo "=== entropy-coded bitstream (fixed): $(date) ==="
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

echo "=== real-audio smoke (fixed): $(date) ==="
timeout 2400 python eval.py -c logs/synth/config.yaml \
    --ckpt logs/synth/00025.ckpt.npz \
    -i /root/reference/onnx/input_speech.wav --verbose \
    > logs/r4_real_audio_eval.log 2>&1
echo "real-audio eval rc=$? $(date)"

echo "=== r4 orchestrator v4 complete: $(date) ==="
