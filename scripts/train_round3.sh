#!/bin/bash
# Round-3 quality runs: music topology (12 q) then avocodo, sequentially on
# the single chip. Logs to logs/round3_*.log; each run resumes from its
# latest checkpoint if interrupted.
set -u
cd /root/repo
mkdir -p logs

echo "=== music topology run: $(date) ==="
timeout 14400 python train.py -n synth_music -c configs/hilcodec_music_synth.yaml \
    > logs/round3_music.log 2>&1
echo "music rc=$? $(date)"

echo "=== avocodo run: $(date) ==="
timeout 14400 python train.py -n synth_avocodo -c configs/avocodo_synth.yaml \
    > logs/round3_avocodo.log 2>&1
echo "avocodo rc=$? $(date)"
