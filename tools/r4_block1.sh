#!/bin/sh
# Round-4 chip block 1: profile trace (VERDICT r3 #1) + batch sweep on the
# r3 solver defaults (VERDICT r3 #2).  Sequential; per-job timeout caps.
cd /root/repo
echo "=== block1 start $(date -u +%H:%M:%S)"
timeout 900 python -u tools/profile_trace.py --num-envs 768 --iters 5 \
  --out benchdata/trace_r4_768 2>&1 | tail -3
echo "=== trace done $(date -u +%H:%M:%S) rc=$?"
BENCH_SWEEP=512,1536,2048,4096 timeout 2400 python -u bench.py 2>&1 | tail -2
echo "=== sweep done $(date -u +%H:%M:%S) rc=$?"
