#!/bin/bash
# Round-5b re-land chain. The machine hosting the round-5 stage-1/2/3
# chains was recycled mid-round: every checkpoint, log, dataset, and the
# compile cache were lost (the flagship trainer was at epoch ~72 of 100).
# This chain re-lands the training-dependent rows from scratch on the
# fresh chip, ordered so results land incrementally if time runs out:
#   1. ShapeGain end-to-end row            (VERDICT r4 item 10, ~20 min)
#   2. DirectoriesDataset recipe rows      (VERDICT r4 item 3,  ~60 min)
#   3. flagship speech 100-epoch budget curve + bitrate grid (items 4/5)
#   4. LM retrain on the new tokens, entropy rows, LIVE entropy-coded
#      streaming measurement, bench.py RTF regression (item 7)
# Fail-LOUD (VERDICT r4 weak-2): every step asserts its artifact into the
# status log; evals are idempotent (skipped once an "ok <name>:" exists).
set -u
cd /root/repo
S=logs/r5b_status.log
note() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; echo "$*"; }
METRICS=stoi,sisdr,mcd,pesq,visqol

ev() { # ev <name> <config> <ckpt> <input> <n_q>
    local name=$1 cfg=$2 ckpt=$3 inp=$4 nq=$5
    if grep -q "ok $name:" "$S" 2>/dev/null; then return 0; fi
    if [ ! -f "$ckpt" ]; then note "FAIL eval $name: missing ckpt $ckpt"; return 1; fi
    timeout 2400 python eval.py -c "$cfg" --ckpt "$ckpt" -i "$inp" -n "$nq" \
        -m "$METRICS" > "logs/r5b_eval_${name}.log" 2>&1
    local rc=$?
    if grep -q "+/-" "logs/r5b_eval_${name}.log"; then
        note "ok $name: $(grep -E '\+/-' "logs/r5b_eval_${name}.log" | tr '\n' ' ')"
    else
        note "FAIL eval $name rc=$rc (tail: $(tail -2 "logs/r5b_eval_${name}.log" | tr '\n' ' '))"
        return 1
    fi
}

trainrun() { # trainrun <name> <config> <timeout_s> <logfile> [-p overrides...]
    # restart semantics: a run dir with checkpoints resumes (no -c: the
    # snapshot config is authoritative); a checkpoint-less leftover dir
    # (e.g. from a crashed attempt) is wiped so the snapshot guard
    # (utils/hparams.py FileExistsError) doesn't reject the retrain.
    local name=$1 cfg=$2 to=$3 lg=$4; shift 4
    if ls "logs/$name"/*.ckpt.npz >/dev/null 2>&1; then
        timeout "$to" python train.py -n "$name" "$@" >> "$lg" 2>&1
    else
        rm -rf "logs/$name"
        timeout "$to" python train.py -n "$name" -c "$cfg" "$@" >> "$lg" 2>&1
    fi
}

note "r5b chain start"
# wait for the bench smoke run to free the chip
if [ -f /tmp/bench_smoke.pid ]; then
    while kill -0 "$(cat /tmp/bench_smoke.pid)" 2>/dev/null; do sleep 15; done
fi
note "chip free; stage 1 (shapegain)"

# -- 1. ShapeGain end-to-end --------------------------------------------------
if [ ! -f logs/synth_shapegain/00010.ckpt.npz ]; then
    trainrun synth_shapegain configs/hilcodec_shapegain_synth.yaml \
        4000 logs/r5b_shapegain_train.log
    rc=$?
    [ -f logs/synth_shapegain/00010.ckpt.npz ] \
        && note "ok shapegain train (rc=$rc)" \
        || note "FAIL shapegain train rc=$rc (tail: $(tail -3 logs/r5b_shapegain_train.log | tr -d '\r' | tail -c 300))"
fi
ev shapegain_n8 logs/synth_shapegain/config.yaml \
   logs/synth_shapegain/00010.ckpt.npz data/synth/eval 8

# -- 2. DirectoriesDataset recipe ---------------------------------------------
note "stage 2 (music_dirs)"
if [ ! -f logs/synth_music_dirs/00025.ckpt.npz ]; then
    trainrun synth_music_dirs configs/hilcodec_music_dirs_synth.yaml \
        7200 logs/r5b_music_dirs_train.log
    rc=$?
    [ -f logs/synth_music_dirs/00025.ckpt.npz ] \
        && note "ok music_dirs train (rc=$rc)" \
        || note "FAIL music_dirs train rc=$rc (tail: $(tail -3 logs/r5b_music_dirs_train.log | tr -d '\r' | tail -c 300))"
fi
MC=logs/synth_music_dirs/config.yaml
MK=logs/synth_music_dirs/00025.ckpt.npz
ev music_dirs_n12 "$MC" "$MK" data/synth/music_eval 12
ev music_dirs_n8  "$MC" "$MK" data/synth/music_eval 8
ev music_dirs_speech_eval_n8 "$MC" "$MK" data/synth/eval 8
ev music_dirs_ood_n8 "$MC" "$MK" data/real_segments 8

# -- 3. flagship speech: 100-epoch budget curve -------------------------------
note "stage 3 (flagship 100 epochs, B=48 bf16)"
if [ ! -f logs/synth/00100.ckpt.npz ]; then
    trainrun synth configs/hilcodec_speech_synth.yaml \
        12000 logs/r5b_speech100_train.log \
        -p train.max_epochs=100 train.batch_size=48 train.compute_dtype=bfloat16
    rc=$?
    [ -f logs/synth/00100.ckpt.npz ] \
        && note "ok speech100 train (rc=$rc)" \
        || note "WARN speech100 trainer rc=$rc without 00100.ckpt.npz; evaluating what exists"
fi
for ep in 00025 00050 00075 00100; do
    for nq in 2 4 8; do
        ev "speech_e${ep}_n${nq}" logs/synth/config.yaml \
           "logs/synth/${ep}.ckpt.npz" data/synth/eval "$nq"
    done
done
ev speech100_ood logs/synth/config.yaml logs/synth/00100.ckpt.npz \
   data/real_segments 8

# -- 4. LM + entropy rows + live streaming + bench regression -----------------
note "stage 4 (LM + entropy + live + bench)"
CKPT=logs/synth/00100.ckpt.npz
[ -f "$CKPT" ] || CKPT=$(ls -t logs/synth/*.ckpt.npz 2>/dev/null | head -1)
if [ -n "$CKPT" ] && [ -f "$CKPT" ]; then
    note "lm stage using codec ckpt $CKPT"
    timeout 7200 python scripts/train_lm.py -c logs/synth/config.yaml \
        --ckpt "$CKPT" --data data/synth --out logs/synth_lm \
        > logs/r5b_lm.log 2>&1
    if grep -q "FINAL" logs/r5b_lm.log; then
        note "ok lm: $(grep FINAL logs/r5b_lm.log | tail -1)"
        LM=$(ls -t logs/synth_lm/*.ckpt.npz | head -1)
        timeout 2400 python scripts/entropy_code.py -c logs/synth/config.yaml \
            --ckpt "$CKPT" --lm "$LM" -i "$(ls data/synth/eval/*.wav | head -1)" \
            --out /tmp/r5b_synth.hilstream > logs/r5b_entropy_code.log 2>&1 \
            && note "ok entropy synth: $(tail -2 logs/r5b_entropy_code.log | tr '\n' ' ')" \
            || note "FAIL entropy synth (tail: $(tail -2 logs/r5b_entropy_code.log | tr '\n' ' '))"
        timeout 2400 python scripts/entropy_code.py -c logs/synth/config.yaml \
            --ckpt "$CKPT" --lm "$LM" -i /root/reference/onnx/input_speech.wav \
            --out /tmp/r5b_real.hilstream > logs/r5b_entropy_code_real.log 2>&1 \
            && note "ok entropy real: $(tail -2 logs/r5b_entropy_code_real.log | tr '\n' ' ')" \
            || note "FAIL entropy real (tail: $(tail -2 logs/r5b_entropy_code_real.log | tr '\n' ' '))"
        timeout 2400 python infer.py -c logs/synth/config.yaml --ckpt "$CKPT" \
            -i "$(ls data/synth/eval/*.wav | head -1)" -o /tmp/r5b_live \
            --entropy-stream "$LM" > logs/r5b_entropy_live.log 2>&1
        grep -q "roundtrip_exact=True" logs/r5b_entropy_live.log \
            && note "ok entropy-live: $(grep 'live entropy' logs/r5b_entropy_live.log | tail -1)" \
            || note "FAIL entropy-live (tail: $(tail -2 logs/r5b_entropy_live.log | tr '\n' ' '))"
    else
        note "FAIL lm train (tail: $(tail -2 logs/r5b_lm.log | tr '\n' ' '))"
    fi
else
    note "FAIL lm stage: no codec checkpoint exists"
fi

timeout 3000 python bench.py > logs/r5b_bench_verify.log 2>&1
grep -q '"metric"' logs/r5b_bench_verify.log \
    && note "ok bench: $(grep '"metric"' logs/r5b_bench_verify.log | tail -1)" \
    || note "FAIL bench (tail: $(tail -2 logs/r5b_bench_verify.log | tr '\n' ' '))"

note "r5b chain done"
