#!/bin/bash
# Stage 3 of the healthy-window chain (runbook -> followup -> this): once
# bench/runbook_followup.sh prints FOLLOWUP DONE, capture a fresh profiler
# trace of the fused bench on HEALTHY executables and summarize it. The
# round-2 traces that pinned the VAE relayout tax / DiT amax passes are gone;
# this regenerates them for the linears+elementwise (~90 ms/step) and VAE
# decode decompositions.
# ONE TPU process at a time: waits for /tmp/tpu_loop.pid to clear.
# Usage: nohup bash bench/profile_after.sh > /tmp/profile_after.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

while [ -f /tmp/tpu_loop.pid ] || ! grep -q "FOLLOWUP DONE" /tmp/followup.log 2>/dev/null; do
    sleep 120
done
echo $$ > /tmp/tpu_loop.pid
echo "$(date -u +%H:%M:%S) followup done — capturing profile trace"

rm -rf /tmp/rtv_trace_r3
# 2 blocks is enough for a steady-state block (first block carries prefill)
RTV_PROFILE_DIR=/tmp/rtv_trace_r3 RTV_BENCH_BLOCKS=2 timeout 7200 \
    python bench.py > /tmp/bench_profiled.json 2> /tmp/bench_profiled.log
echo "profiled bench: $(cat /tmp/bench_profiled.json)"
python bench/read_trace.py /tmp/rtv_trace_r3 60 > /tmp/trace_summary_r3.txt 2>&1
tail -40 /tmp/trace_summary_r3.txt

rm -f /tmp/tpu_loop.pid
echo "PROFILE DONE"
