#!/bin/bash
# Round-4: re-score the surviving trained checkpoints with the full
# in-env metric set (STOI + SI-SDR + MCD) so every family's quality row
# rests on three independent metrics instead of STOI alone
# (VERDICT r3 missing #3 — PESQ/ViSQOL backends cannot exist in this env).
# Waits for the encodec eval32 rerun to drain the chip first.
set -u
cd /root/repo
while ! grep -q "eval32 rerun done" /tmp/r4_eval32.log 2>/dev/null; do
    sleep 60
done
echo "=== metrics refresh start: $(date) ==="
for run in synth:8 synth_avo_hiltrainer:8 synth_encodec:8; do
    name=${run%%:*}; n=${run##*:}
    timeout 2400 python eval.py -c logs/$name/config.yaml \
        --ckpt logs/$name/00025.ckpt.npz -i data/synth/eval -n $n \
        -m stoi,sisdr,mcd > logs/r4_refresh_$name.log 2>&1
    echo "refresh $name n=$n rc=$? $(date)"
done
echo "=== metrics refresh done: $(date) ==="
