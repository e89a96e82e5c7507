#!/bin/bash
# Round-5 gap-filler: after the main eval chain writes "chain done",
# re-run exactly the grid cells whose status line says FAIL (e.g. the
# e00025_n2 cell lost to a process kill, or e00100 cells raced against
# the still-training checkpoint). Fail-loud, idempotent.
set -u
cd /root/repo
S=logs/r5_chain_status.log
note() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; echo "$*"; }

note "gapfill armed; waiting for eval chain"
while ! grep -q "chain done" "$S" 2>/dev/null; do sleep 60; done

METRICS=stoi,sisdr,mcd,pesq,visqol
ev() { # ev <name> <config> <ckpt> <input> <n_q>
    local name=$1 cfg=$2 ckpt=$3 inp=$4 nq=$5
    # skip cells that already have an ok line
    if grep -q "ok $name:" "$S"; then return 0; fi
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

for ep in 00025 00050 00075 00100; do
    for nq in 2 4 8; do
        ev "speech_e${ep}_n${nq}" logs/synth/config.yaml \
           "logs/synth/${ep}.ckpt.npz" data/synth/eval "$nq"
    done
done
ev speech100_ood logs/synth/config.yaml logs/synth/00100.ckpt.npz \
   data/real_segments 8
MC=logs/synth_music_dirs/config.yaml
MK=logs/synth_music_dirs/00025.ckpt.npz
ev music_dirs_n12 "$MC" "$MK" data/synth/music_eval 12
ev music_dirs_n8  "$MC" "$MK" data/synth/music_eval 8
ev music_dirs_speech_eval_n8 "$MC" "$MK" data/synth/eval 8
ev music_dirs_ood_n8 "$MC" "$MK" data/real_segments 8
if [ -f logs/synth_shapegain/00010.ckpt.npz ]; then
    ev shapegain_n8 logs/synth_shapegain/config.yaml \
       logs/synth_shapegain/00010.ckpt.npz data/synth/eval 8
fi

note "gapfill done"
