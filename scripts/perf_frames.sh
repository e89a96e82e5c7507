#!/bin/bash
# Round-4 follow-up perf queue: block-streaming (--frames F) and kernel
# M-dim (--chunks 1 at 512 streams) A/Bs against the frame-by-frame
# plateau. Motivated by the roofline rows in logs/r4_perf.log: the frame
# program runs at ~28% of MXU peak with 2% HBM utilization and an ~80 us
# fixed per-scan-iteration cost (scripts/streaming_roofline.py --probe) —
# i.e. bound by small per-frame kernel shapes, not FLOPs or bytes. Blocks
# of F frames multiply per-kernel work by F at F x 13.33 ms latency;
# tokens stay bit-identical (test_stream_block_sizes_agree).
set -u
cd "$(dirname "$0")/.."
LOG=logs/r4_perf_frames.log
mkdir -p logs
{
echo "=== frames/chunks queue start: $(date)"
for f in 2 4 8 16; do
  echo "--- 128 streams, frames=$f"
  timeout 1200 python bench.py 128 --frames "$f"
done
echo "--- 512 streams, one kernel group (M=512)"
timeout 1200 python bench.py 512 --chunks 1
echo "--- 512 streams, frames=4, one group"
timeout 1200 python bench.py 512 --chunks 1 --frames 4
echo "--- 128 streams, frames=4, fused single scan"
timeout 1200 python bench.py 128 --frames 4 --fused
echo "--- shape-aware MXU floor (per-conv-signature measured)"
timeout 2400 python scripts/streaming_roofline.py 128 \
    --seconds 0.0134 --analytic-only --shapes
echo "=== frames/chunks queue done: $(date)"
} >> "$LOG" 2>&1
