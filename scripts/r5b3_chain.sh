#!/bin/bash
# Round-5b takeover chain (supersedes r5b2_chain.sh, whose driver was
# killed after its stage-1 shapegain trainer crashed in infer_epoch on the
# traced-n bug — fixed in ops/shape_gain.py — and whose stage-2 music_dirs
# trainer was left running as an orphan). Waits for that orphan, then:
#   1. music_dirs 4 eval rows                 (VERDICT r4 item 3)
#   2. shapegain resume 5->10 epochs + eval   (item 10, retrained on the fix)
#   3. serving device-floor re-evidence       (round-5 logs were wiped)
#   4. flagship to 50 epochs + e25/e50 grid + OOD row
#   5. LM retrain on the 50-epoch tokens + entropy rows + LIVE streaming
#   6. bench.py 128 RTF regression (warms the driver's compile cache)
#   7. flagship resume to 100 + e75/e100 grid + OOD row
#   8. flagship resume to 150 + e125/e150 rows (only if time remains)
# Shares logs/r5b_status.log with r5b2 so its "ok" markers still skip.
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
    local name=$1 cfg=$2 to=$3 lg=$4; shift 4
    if ls "logs/$name"/*.ckpt.npz >/dev/null 2>&1; then
        timeout "$to" python train.py -n "$name" "$@" >> "$lg" 2>&1
    else
        rm -rf "logs/$name"
        timeout "$to" python train.py -n "$name" -c "$cfg" "$@" >> "$lg" 2>&1
    fi
}

# -- 0. wait for the orphaned music_dirs trainer to release the chip ----------
# Matches only real trainer processes (argv[0] python, argv[1] train.py),
# never this session's bash/python -c wrappers; optional $1 = orphan PID.
ORPHAN=${1:-}
chip_busy() {
    [ -n "$ORPHAN" ] && [ -d "/proc/$ORPHAN" ] && return 0
    local f c
    for f in /proc/[0-9]*/cmdline; do
        c=$(tr '\0' ' ' < "$f" 2>/dev/null) || continue
        case "$c" in
            python\ train.py\ -n\ *|python3\ train.py\ -n\ *) return 0 ;;
        esac
    done
    return 1
}
note "r5b3 chain armed; waiting for the orphan music_dirs trainer"
while chip_busy; do sleep 30; done
note "chip free"

# -- 1. music_dirs evals -------------------------------------------------------
[ -f logs/synth_music_dirs/00025.ckpt.npz ] \
    && note "ok music_dirs train (orphan finished)" \
    || note "WARN music_dirs 00025 ckpt missing (tail: $(tail -3 logs/r5b_music_dirs_train.log | tr -d '\r' | tail -c 200))"
MC=logs/synth_music_dirs/config.yaml
MK=logs/synth_music_dirs/00025.ckpt.npz
ev music_dirs_n12 "$MC" "$MK" data/synth/music_eval 12
ev music_dirs_n8  "$MC" "$MK" data/synth/music_eval 8
ev music_dirs_speech_eval_n8 "$MC" "$MK" data/synth/eval 8
ev music_dirs_ood_n8 "$MC" "$MK" data/real_segments 8

# -- 2. shapegain resume (5->10 epochs on the traced-n fix) + eval -------------
if [ ! -f logs/synth_shapegain/00010.ckpt.npz ]; then
    note "stage 2 (shapegain resume 5->10)"
    trainrun synth_shapegain configs/hilcodec_shapegain_synth.yaml \
        3600 logs/r5b_shapegain_train.log
    rc=$?
    [ -f logs/synth_shapegain/00010.ckpt.npz ] \
        && note "ok shapegain train (rc=$rc)" \
        || note "FAIL shapegain train rc=$rc (tail: $(tail -3 logs/r5b_shapegain_train.log | tr -d '\r' | tail -c 300))"
fi
ev shapegain_n8 logs/synth_shapegain/config.yaml \
   logs/synth_shapegain/00010.ckpt.npz data/synth/eval 8

# -- 3. serving device floor (re-evidence: round-5 logs were wiped) ----------
if ! grep -q "ok serve floor:" "$S"; then
    note "stage 3 (serving device floor)"
    timeout 1800 python scripts/serve_device_floor.py 128 200 \
        > logs/r5b_serve_floor.log 2>&1
    grep -q "per-tick" logs/r5b_serve_floor.log \
        && note "ok serve floor: $(grep 'per-tick' logs/r5b_serve_floor.log | tail -1)" \
        || note "FAIL serve floor (tail: $(tail -2 logs/r5b_serve_floor.log | tr '\n' ' '))"
fi

# -- 4. flagship to 50 epochs -------------------------------------------------
# Up to 3 attempts: a timeout mid-run resumes from the last save_interval=5
# checkpoint, so retries heal timeouts instead of losing the stage's evals.
note "stage 4 (flagship to 50 epochs, B=48 bf16)"
for attempt in 1 2 3; do
    [ -f logs/synth/00050.ckpt.npz ] && break
    trainrun synth configs/hilcodec_speech_synth.yaml \
        9000 logs/r5b_speech_train.log \
        -p train.max_epochs=50 train.batch_size=48 train.compute_dtype=bfloat16
    rc=$?
    [ -f logs/synth/00050.ckpt.npz ] \
        && note "ok speech50 train (rc=$rc, attempt $attempt)" \
        || note "WARN speech50 attempt $attempt rc=$rc without 00050.ckpt.npz (latest: $(ls -t logs/synth/*.ckpt.npz 2>/dev/null | head -1))"
done
for ep in 00025 00050; do
    for nq in 2 4 8; do
        ev "speech_e${ep}_n${nq}" logs/synth/config.yaml \
           "logs/synth/${ep}.ckpt.npz" data/synth/eval "$nq"
    done
done
ev speech50_ood logs/synth/config.yaml logs/synth/00050.ckpt.npz \
   data/real_segments 8

# -- 5. LM + entropy + live streaming on the 50-epoch tokens ------------------
note "stage 5 (LM + entropy + live)"
CKPT=logs/synth/00050.ckpt.npz
[ -f "$CKPT" ] || CKPT=$(ls -t logs/synth/*.ckpt.npz 2>/dev/null | head -1)
if [ -n "${CKPT:-}" ] && [ -f "$CKPT" ] && ! grep -q "ok lm:" "$S"; then
    note "lm stage using codec ckpt $CKPT"
    timeout 7200 python scripts/train_lm.py -c logs/synth/config.yaml \
        --ckpt "$CKPT" --data data/synth --out logs/synth_lm \
        > logs/r5b_lm.log 2>&1
    if grep -q "FINAL" logs/r5b_lm.log; then
        note "ok lm: $(grep FINAL logs/r5b_lm.log | tail -1)"
    else
        note "FAIL lm train (tail: $(tail -2 logs/r5b_lm.log | tr '\n' ' '))"
    fi
fi
LM=$(ls -t logs/synth_lm/*.ckpt.npz 2>/dev/null | head -1)
if [ -n "${LM:-}" ] && [ -f "${LM:-}" ]; then
    grep -q "ok entropy synth:" "$S" || {
        timeout 2400 python scripts/entropy_code.py -c logs/synth/config.yaml \
            --ckpt "$CKPT" --lm "$LM" -i "$(ls data/synth/eval/*.wav | head -1)" \
            --out /tmp/r5b_synth.hilstream > logs/r5b_entropy_code.log 2>&1 \
            && note "ok entropy synth: $(tail -2 logs/r5b_entropy_code.log | tr '\n' ' ')" \
            || note "FAIL entropy synth (tail: $(tail -2 logs/r5b_entropy_code.log | tr '\n' ' '))"; }
    grep -q "ok entropy real:" "$S" || {
        timeout 2400 python scripts/entropy_code.py -c logs/synth/config.yaml \
            --ckpt "$CKPT" --lm "$LM" -i /root/reference/onnx/input_speech.wav \
            --out /tmp/r5b_real.hilstream > logs/r5b_entropy_code_real.log 2>&1 \
            && note "ok entropy real: $(tail -2 logs/r5b_entropy_code_real.log | tr '\n' ' ')" \
            || note "FAIL entropy real (tail: $(tail -2 logs/r5b_entropy_code_real.log | tr '\n' ' '))"; }
    grep -q "ok entropy-live:" "$S" || {
        timeout 2400 python infer.py -c logs/synth/config.yaml --ckpt "$CKPT" \
            -i "$(ls data/synth/eval/*.wav | head -1)" -o /tmp/r5b_live \
            --entropy-stream "$LM" > logs/r5b_entropy_live.log 2>&1
        grep -q "roundtrip_exact=True" logs/r5b_entropy_live.log \
            && note "ok entropy-live: $(grep 'live entropy' logs/r5b_entropy_live.log | tail -1)" \
            || note "FAIL entropy-live (tail: $(tail -2 logs/r5b_entropy_live.log | tr '\n' ' '))"; }
else
    note "FAIL lm stage: no LM checkpoint"
fi

# -- 6. bench regression -------------------------------------------------------
if ! grep -q "ok bench:" "$S"; then
    timeout 3000 python bench.py > logs/r5b_bench_verify.log 2>&1
    grep -q '"metric"' logs/r5b_bench_verify.log \
        && note "ok bench: $(grep '"metric"' logs/r5b_bench_verify.log | tail -1)" \
        || note "FAIL bench (tail: $(tail -2 logs/r5b_bench_verify.log | tr '\n' ' '))"
fi

# -- 7. flagship 50 -> 100 ------------------------------------------------------
note "stage 7 (flagship resume to 100)"
for attempt in 1 2 3; do
    [ -f logs/synth/00100.ckpt.npz ] && break
    trainrun synth configs/hilcodec_speech_synth.yaml \
        9000 logs/r5b_speech_train.log -p train.max_epochs=100
    rc=$?
    [ -f logs/synth/00100.ckpt.npz ] \
        && note "ok speech100 train (rc=$rc, attempt $attempt)" \
        || note "WARN speech100 attempt $attempt rc=$rc without 00100.ckpt.npz (latest: $(ls -t logs/synth/*.ckpt.npz 2>/dev/null | head -1))"
done
for ep in 00075 00100; do
    for nq in 2 4 8; do
        ev "speech_e${ep}_n${nq}" logs/synth/config.yaml \
           "logs/synth/${ep}.ckpt.npz" data/synth/eval "$nq"
    done
done
ev speech100_ood logs/synth/config.yaml logs/synth/00100.ckpt.npz \
   data/real_segments 8

# -- 8. flagship 100 -> 150 (reference full budget; only if time remains) ------
note "stage 8 (flagship resume to 150)"
for attempt in 1 2 3; do
    [ -f logs/synth/00150.ckpt.npz ] && break
    trainrun synth configs/hilcodec_speech_synth.yaml \
        9000 logs/r5b_speech_train.log -p train.max_epochs=150
    rc=$?
    [ -f logs/synth/00150.ckpt.npz ] \
        && note "ok speech150 train (rc=$rc, attempt $attempt)" \
        || note "WARN speech150 attempt $attempt rc=$rc without 00150.ckpt.npz (latest: $(ls -t logs/synth/*.ckpt.npz 2>/dev/null | head -1))"
done
for ep in 00125 00150; do
    for nq in 2 4 8; do
        ev "speech_e${ep}_n${nq}" logs/synth/config.yaml \
           "logs/synth/${ep}.ckpt.npz" data/synth/eval "$nq"
    done
done
ev speech150_ood logs/synth/config.yaml logs/synth/00150.ckpt.npz \
   data/real_segments 8

note "r5b3 chain done"

# -- 9. appended retries (landed while the chain was running) -----------------
# music_dirs OOD row: first attempt timed out at 2400 s with zero output
# (fresh 256-frame offline-program compile or a wedge — logged 10:48:27).
# Retry with verbose per-file progress and a bigger budget; the compile
# cache should make the model leg fast if the first attempt's compile
# finished before its timeout.
if ! grep -q "ok music_dirs_ood_n8:" "$S"; then
    timeout 3600 python eval.py -c logs/synth_music_dirs/config.yaml \
        --ckpt logs/synth_music_dirs/00025.ckpt.npz -i data/real_segments \
        -n 8 -m "$METRICS" -v > logs/r5b_eval_music_dirs_ood_n8.log 2>&1
    grep -q "+/-" logs/r5b_eval_music_dirs_ood_n8.log \
        && note "ok music_dirs_ood_n8: $(grep -E '\+/-' logs/r5b_eval_music_dirs_ood_n8.log | tr '\n' ' ')" \
        || note "FAIL music_dirs_ood_n8 retry (tail: $(tr '\r' '\n' < logs/r5b_eval_music_dirs_ood_n8.log | tail -3 | tr '\n' ' '))"
fi
note "r5b3 chain done (incl. appended retries)"
