#!/bin/bash
# Round-5 follow-up: after the knob A/Bs, re-smoke the VMEM-fixed kernels at
# in-model shapes, then fused-bench whichever kernel compiles clean.
# Waits for the previous TPU owner (r5_fused_ab.sh) to release the chip.
set -u
cd "$(dirname "$0")/.."
while [ -f /tmp/tpu_loop.pid ] && kill -0 "$(cat /tmp/tpu_loop.pid)" 2>/dev/null; do
    sleep 60
done
echo $$ > /tmp/tpu_loop.pid
trap 'rm -f /tmp/tpu_loop.pid' EXIT

run_bench() { # run_bench NAME [ENV=VAL ...]
    local NAME="$1"; shift
    echo "== bench $NAME ($(date -u +%H:%M)) env: $* =="
    env "$@" RTV_BENCH_HEALTH_WAIT_S=60 timeout 7200 python bench.py \
        > "/tmp/bench_r5_${NAME}.json" 2> "/tmp/bench_r5_${NAME}.log"
    echo "bench $NAME: $(cat /tmp/bench_r5_${NAME}.json 2>/dev/null)"
}

echo "== kernel smoke ($(date -u +%H:%M)) =="
timeout 2400 python bench/kernel_smoke.py all 2>/dev/null | grep -E "^(mm|conv)" \
    | tee /tmp/kernel_smoke3.log

if grep -q "^mm: .* 0 fail" /tmp/kernel_smoke3.log; then
    run_bench pallasmm2 RTV_DIT_PALLAS_MM=1
else
    echo "mm kernel still failing shapes; fused bench skipped"
fi
if grep -q "^conv: .* 0 fail" /tmp/kernel_smoke3.log; then
    run_bench pallasconv2 RTV_VAE_CONV=pallas
else
    echo "conv kernel still failing shapes; fused bench skipped"
fi
echo "R5 KERNEL FOLLOWUP DONE"
