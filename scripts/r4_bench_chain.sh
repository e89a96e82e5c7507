#!/bin/bash
# Round-4 tail chain: (1) re-verify the headline streaming bench after the
# staged-grid Pallas RVQ rewrite (ops/pallas_rvq.py now stages codebook
# stacks through VMEM — must not regress the 128-stream RTF), (2) train-step
# batch sweep: the round-3 roofline says bigger batch amortizes weight
# reads (74.4 audio-s/s @ B=24 -> 82.9 @ B=48); measure B=96 (and B=64)
# to find the throughput knee. Waits for the metrics-refresh queue first.
set -u
cd /root/repo
while ! grep -q "metrics refresh done" /tmp/r4_refresh.log 2>/dev/null; do
    sleep 60
done
echo "=== bench chain start: $(date) ==="
timeout 2400 python bench.py 128 > logs/r4_bench_verify.log 2>&1
echo "bench 128 rc=$? $(date)"
tail -1 logs/r4_bench_verify.log
for b in 48 64 96; do
    timeout 2400 python scripts/bench_train_step.py bf16 $b \
        > logs/r4_bsweep_$b.log 2>&1
    echo "bsweep B=$b rc=$? $(date)"
    tail -1 logs/r4_bsweep_$b.log
done
echo "=== bench chain done: $(date) ==="
