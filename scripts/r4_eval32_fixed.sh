#!/bin/bash
# Round-4: rerun the EnCodec n=32 eval after the staged-Pallas-RVQ Mosaic
# tiling fix (commit b68fbc5) — the first rerun crashed in lowering on the
# (1, block_m) output block. Waits for the speech 25->50 chain to drain
# the chip, then also re-scores n=32 with the full in-env metric set.
set -u
cd /root/repo
while ! grep -q "speech 25->50 chain done" /tmp/r4_speech50.log 2>/dev/null; do
    sleep 120
done
echo "=== eval32 (fixed kernel) start: $(date) ==="
timeout 3600 python eval.py -c logs/synth_encodec/config.yaml \
    --ckpt logs/synth_encodec/00025.ckpt.npz -i data/synth/eval -n 32 \
    -m stoi,sisdr,mcd > logs/r4_encodec_eval32.log 2>&1
echo "encodec eval n=32 rc=$? $(date)"
tail -5 logs/r4_encodec_eval32.log
echo "=== eval32 (fixed kernel) done: $(date) ==="
