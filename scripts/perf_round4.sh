#!/bin/bash
# Round-4 streaming-perf experiment queue (VERDICT r3 item 1): roofline
# floors + the bf16-weights / full-bf16 / fused-scan A/Bs against the
# three-round 1718x plateau. Short runs; needs the chip idle.
set -u
cd "$(dirname "$0")/.."
LOG=logs/r4_perf.log
mkdir -p logs
{
echo "=== perf queue start: $(date)"
echo "--- regression f32"
timeout 1200 python bench.py 128
echo "--- fused single-scan f32"
timeout 1200 python bench.py 128 --fused
echo "--- bf16 weights (f32 activations/caches)"
timeout 1200 python bench.py 128 --dtype bf16w
echo "--- bf16 weights + fused"
timeout 1200 python bench.py 128 --dtype bf16w --fused
echo "--- full bf16"
timeout 1200 python bench.py 128 --dtype bf16
echo "--- full bf16 + fused"
timeout 1200 python bench.py 128 --dtype bf16 --fused
echo "--- roofline f32 (+probe)"
timeout 1800 python scripts/streaming_roofline.py 128 --probe
echo "--- roofline bf16w (+token agreement)"
timeout 1800 python scripts/streaming_roofline.py 128 --dtype bf16w --agree
echo "--- roofline bf16 (+token agreement)"
timeout 1800 python scripts/streaming_roofline.py 128 --dtype bf16 --agree
echo "--- single-stream latency modes"
timeout 1200 python bench.py 1
timeout 1200 python bench.py 1 --fused
timeout 1200 python bench.py 1 --dtype bf16
timeout 1200 python bench.py 1 --dtype bf16 --fused
echo "--- large-B (HBM-heavier regime)"
timeout 1200 python bench.py 512 --chunks 4
timeout 1200 python bench.py 512 --chunks 4 --dtype bf16
echo "=== perf queue done: $(date)"
} >> "$LOG" 2>&1
