#!/bin/bash
# Megakernel/scan A/B sweep + stream-scaling (HBM cliff) measurement on the
# real chip. Writes one JSON line per point to the given output file.
# Usage: bash scripts/bench_sweep.sh [out.jsonl]
set -u
OUT="${1:-/tmp/bench_sweep.jsonl}"
: > "$OUT"
for s in 1 8 16 32; do
  for flag in --megakernel --no-megakernel; do
    line=$(timeout 1800 python bench.py "$s" $flag 2>/dev/null | tail -1)
    echo "{\"streams\": $s, \"mode\": \"$flag\", \"r\": $line}" >> "$OUT"
    echo "done $s $flag" >&2
  done
done
for s in 64 128 192 256 384 512; do
  line=$(timeout 1800 python bench.py "$s" --no-megakernel 2>/dev/null | tail -1)
  echo "{\"streams\": $s, \"mode\": \"scan\", \"r\": $line}" >> "$OUT"
  echo "done $s scan" >&2
done
