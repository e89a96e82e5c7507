#!/bin/bash
# Round-4: on-chip serving benchmark — serve.py with a 128-slot roundtrip
# engine on the v5e chip, driven by scripts/serve_load.py with real-time-
# paced concurrent clients. Waits for the fixed-kernel eval32 to drain the
# chip. Produces the serving-latency rows for BASELINE.md.
set -u
cd /root/repo
while ! grep -q "eval32 (fixed kernel) done" /tmp/r4_eval32fixed.log 2>/dev/null; do
    sleep 120
done
echo "=== serve bench start: $(date) ==="

run_against_server() {  # $1 = gather_ms tag
    local tag=$1
    # warm-up: one short unpaced client triggers the single compile of the
    # 128-slot frame program (shapes are static, so one compile serves any
    # client count)
    timeout 900 python scripts/serve_load.py --port 7912 --clients 1 \
        --frames 3 --rate 0 > logs/r4_serve_warmup_$tag.log 2>&1
    echo "warmup($tag) rc=$? $(date)"
    # measured: paced 1x real-time clients at three occupancies
    for c in 16 64 128; do
        timeout 900 python scripts/serve_load.py --port 7912 --clients $c \
            --frames 400 --rate 1.0 > logs/r4_serve_paced_${tag}_$c.log 2>&1
        echo "paced($tag) clients=$c rc=$? $(date)"
        tail -1 logs/r4_serve_paced_${tag}_$c.log
    done
    # throughput mode: unpaced, full occupancy
    timeout 900 python scripts/serve_load.py --port 7912 --clients 128 \
        --frames 400 --rate 0 > logs/r4_serve_unpaced_$tag.log 2>&1
    echo "unpaced($tag) rc=$? $(date)"
    tail -1 logs/r4_serve_unpaced_$tag.log
}

for g in 0 4; do
    nohup python serve.py -c configs/hilcodec_speech.yaml \
        --port 7912 --slots 128 --gather-ms $g \
        > logs/r4_serve_server_g$g.log 2>&1 &
    echo $! > /tmp/r4_serve_server.pid
    for i in $(seq 1 90); do
        grep -q serving logs/r4_serve_server_g$g.log && break
        sleep 2
    done
    tail -1 logs/r4_serve_server_g$g.log
    run_against_server g$g
    kill $(cat /tmp/r4_serve_server.pid) 2>/dev/null
    sleep 5
done
echo "=== serve bench done: $(date) ==="
