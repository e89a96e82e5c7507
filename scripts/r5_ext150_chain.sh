#!/bin/bash
# Round-5 stage 3: extend the flagship from 100 to 150 epochs (the
# reference's full training budget, configs/hilcodec_music.yaml:119-128)
# and finish the bitrate x budget ladder at {125,150} x n_q {2,4,8} plus
# the out-of-domain CI row at 150. Runs after scripts/r5_lm_chain.sh
# writes "lm-chain done". Fail-loud like the other chains.
set -u
cd /root/repo
S=logs/r5_chain_status.log
note() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; echo "$*"; }

note "ext150 armed; waiting for lm-chain"
while ! grep -q "lm-chain done" "$S" 2>/dev/null; do sleep 60; done

note "ext150 start: resuming flagship 100 -> 150 epochs"
timeout 14400 python train.py -n synth \
    -p train.max_epochs=150 train.batch_size=48 train.compute_dtype=bfloat16 \
    >> logs/r5_speech150_train.log 2>&1
rc=$?
if [ -f logs/synth/00150.ckpt.npz ]; then
    note "ok ext150 train (rc=$rc)"
else
    note "WARN ext150 trainer exited rc=$rc without 00150.ckpt.npz; evaluating latest"
fi

METRICS=stoi,sisdr,mcd,pesq,visqol
ev() { # ev <name> <config> <ckpt> <input> <n_q>
    local name=$1 cfg=$2 ckpt=$3 inp=$4 nq=$5
    if [ ! -f "$ckpt" ]; then note "FAIL eval $name: missing ckpt $ckpt"; return 1; fi
    timeout 2400 python eval.py -c "$cfg" --ckpt "$ckpt" -i "$inp" -n "$nq" \
        -m "$METRICS" > "logs/r5_eval_${name}.log" 2>&1
    local rc=$?
    if grep -q "+/-" "logs/r5_eval_${name}.log"; then
        note "ok $name: $(grep -E '\+/-' "logs/r5_eval_${name}.log" | tr '\n' ' ')"
    else
        note "FAIL eval $name rc=$rc (no CI lines; tail: $(tail -2 "logs/r5_eval_${name}.log" | tr '\n' ' '))"
        return 1
    fi
}

for ep in 00125 00150; do
    for nq in 2 4 8; do
        ev "speech_e${ep}_n${nq}" logs/synth/config.yaml \
           "logs/synth/${ep}.ckpt.npz" data/synth/eval "$nq"
    done
done
ev speech150_ood logs/synth/config.yaml logs/synth/00150.ckpt.npz \
   data/real_segments 8

note "ext150 done"
