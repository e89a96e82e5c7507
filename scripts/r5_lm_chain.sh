#!/bin/bash
# Round-5 stage 2 (runs after scripts/r5_after_train.sh writes "chain
# done"): retrain the token LM on the 100-epoch flagship's own tokens,
# produce the entropy-coded bitrate rows, measure the LIVE entropy-coded
# streaming path with the trained LM, then a bench.py RTF regression
# check. Fail-loud: every step asserts its artifact into the status log.
set -u
cd /root/repo
S=logs/r5_chain_status.log
note() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; echo "$*"; }

note "lm-chain armed; waiting for eval chain"
while ! grep -q "chain done" "$S" 2>/dev/null; do sleep 60; done

CKPT=logs/synth/00100.ckpt.npz
[ -f "$CKPT" ] || CKPT=$(ls -t logs/synth/*.ckpt.npz | head -1)
note "lm-chain start (codec ckpt $CKPT)"

# -- 1. LM on the trained codec's tokens ------------------------------------
timeout 7200 python scripts/train_lm.py -c logs/synth/config.yaml \
    --ckpt "$CKPT" --data data/synth --out logs/synth_lm \
    > logs/r5_lm.log 2>&1
if grep -q "FINAL" logs/r5_lm.log; then
    note "ok lm: $(grep FINAL logs/r5_lm.log | tail -1)"
else
    note "FAIL lm train (tail: $(tail -2 logs/r5_lm.log | tr '\n' ' '))"
    note "lm-chain done"; exit 1
fi
LM=$(ls -t logs/synth_lm/*.ckpt.npz | head -1)

# -- 2. offline entropy-coded bitstreams (synth + real speech) ---------------
timeout 2400 python scripts/entropy_code.py -c logs/synth/config.yaml \
    --ckpt "$CKPT" --lm "$LM" -i "$(ls data/synth/eval/*.wav | head -1)" \
    --out /tmp/r5_synth.hilstream > logs/r5_entropy_code.log 2>&1 \
    && note "ok entropy synth: $(tail -2 logs/r5_entropy_code.log | tr '\n' ' ')" \
    || note "FAIL entropy synth"
timeout 2400 python scripts/entropy_code.py -c logs/synth/config.yaml \
    --ckpt "$CKPT" --lm "$LM" -i /root/reference/onnx/input_speech.wav \
    --out /tmp/r5_real.hilstream > logs/r5_entropy_code_real.log 2>&1 \
    && note "ok entropy real: $(tail -2 logs/r5_entropy_code_real.log | tr '\n' ' ')" \
    || note "FAIL entropy real"

# -- 3. LIVE entropy-coded streaming with the trained LM ---------------------
timeout 2400 python infer.py -c logs/synth/config.yaml --ckpt "$CKPT" \
    -i "$(ls data/synth/eval/*.wav | head -1)" -o /tmp/r5_live \
    --entropy-stream "$LM" > logs/r5_entropy_live.log 2>&1
if grep -q "roundtrip_exact=True" logs/r5_entropy_live.log; then
    note "ok entropy-live: $(grep 'live entropy' logs/r5_entropy_live.log | tail -1)"
else
    note "FAIL entropy-live (tail: $(tail -2 logs/r5_entropy_live.log | tr '\n' ' '))"
fi

# -- 4. bench.py RTF regression ----------------------------------------------
timeout 3000 python bench.py > logs/r5_bench_verify.log 2>&1
if grep -q '"metric"' logs/r5_bench_verify.log; then
    note "ok bench: $(grep '"metric"' logs/r5_bench_verify.log | tail -1)"
else
    note "FAIL bench (tail: $(tail -2 logs/r5_bench_verify.log | tr '\n' ' '))"
fi

note "lm-chain done"
