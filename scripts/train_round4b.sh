#!/bin/bash
# Round-4 stage B: avocodo quality row + the trainer-swap ablation
# (VERDICT r3 weak #6 / next-round item 8).
set -u
cd /root/repo
mkdir -p logs

echo "=== avocodo (avocodo trainer): $(date) ==="
timeout 10800 python train.py -n synth_avocodo -c configs/avocodo_synth.yaml \
    > logs/r4_avocodo.log 2>&1
echo "avocodo rc=$? $(date)"
timeout 1800 python eval.py -c logs/synth_avocodo/config.yaml \
    --ckpt logs/synth_avocodo/00025.ckpt.npz -i data/synth/eval \
    > logs/r4_avocodo_eval.log 2>&1
echo "avocodo eval rc=$? $(date)"

echo "=== avocodo generator under hilcodec trainer (ablation): $(date) ==="
timeout 10800 python train.py -n synth_avo_hiltrainer \
    -c configs/avocodo_synth_hiltrainer.yaml \
    > logs/r4_avo_hiltrainer.log 2>&1
echo "ablation rc=$? $(date)"
timeout 1800 python eval.py -c logs/synth_avo_hiltrainer/config.yaml \
    --ckpt logs/synth_avo_hiltrainer/00025.ckpt.npz -i data/synth/eval \
    > logs/r4_avo_hiltrainer_eval.log 2>&1
echo "ablation eval rc=$? $(date)"
echo "=== stage B complete: $(date) ==="
