#!/bin/bash
# Round-4 on-chip measurement queue (prepared in round 3 while the TPU
# tunnel was down — see BASELINE.md "Round-3 environment note").
# Run from /root/repo with a live axon TPU. Each step is independent;
# results append to /tmp/r4_queue.log and stdout.
set -x
cd "$(dirname "$0")/.."

echo "=== 1. train-step component breakdown (analytic floors + flags)"
timeout 1800 python scripts/bench_train_step.py bf16 24 --breakdown

echo "=== 2. depthwise conv vs shift lowering micro A/B"
timeout 1200 python scripts/bench_dwconv.py 24

echo "=== 3. full-step lowering A/Bs"
timeout 1200 python scripts/bench_train_step.py bf16 24 --dw=shift
timeout 1200 python scripts/bench_train_step.py bf16 24 --fbd=bands1d
timeout 1200 python scripts/bench_train_step.py bf16 24 --dw=shift --fbd=bands1d

echo "=== 4. headline streaming bench regression (analytic MFU line)"
timeout 1200 python bench.py 128
timeout 1200 python bench.py 128 --model avocodo   # 4th family RTF row

echo "=== 5. (long) encodec trained-quality row:"
echo "  python train.py -n synth_encodec -c configs/encodec_synth.yaml"
echo "  python eval.py -c logs/synth_encodec/config.yaml \\"
echo "    --ckpt logs/synth_encodec/00025.ckpt.npz -i data/synth/eval"
