#!/bin/bash
# Round-5 fused A/B sequence for the dispatch-tax window (2026-08-20): the
# probe's small programs clamp at 24-50 TFLOP/s, but the seed pass measured
# 9.125 fps on FRESH megafused compiles — one dispatch per block is immune
# to the ~32 ms/dispatch tax, so fused benches CAN rank here while micros
# cannot (they amortize the tax over <=30 chained iters and drown in it).
# Fused-bench A/Bs are the decision rule of record anyway (CLAUDE.md).
#
# Order: kernel benches first (no cal-key change -> primed qparams cache
# hits, zero host-side CPU), knob benches after (their cal keys are primed
# by /tmp/prime_knobs.sh once pytest releases the core), default re-measure
# last as the window control.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_loop.pid
trap 'rm -f /tmp/tpu_loop.pid' EXIT

run_bench() { # run_bench NAME [ENV=VAL ...]
    local NAME="$1"; shift
    echo "== bench $NAME ($(date -u +%H:%M)) env: $* =="
    env "$@" RTV_BENCH_HEALTH_WAIT_S=60 timeout 7200 python bench.py \
        > "/tmp/bench_r5_${NAME}.json" 2> "/tmp/bench_r5_${NAME}.log"
    echo "bench $NAME: $(cat /tmp/bench_r5_${NAME}.json 2>/dev/null)"
}

run_bench pallasmm RTV_DIT_PALLAS_MM=1
run_bench pallasconv RTV_VAE_CONV=pallas
# knob benches: wait for their primed cal keys if the primer is still going
while [ ! -f /tmp/prime_knobs_done ] && \
      kill -0 "$(cat /tmp/prime_knobs.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done
run_bench qbf16 RTV_Q_BF16=1
run_bench qrcp RTV_Q_RCP=1
run_bench amaxsub RTV_BENCH_INT8_DIT_STATIC=0 RTV_DIT_AMAX_SUB=4
run_bench default2 RTV_NOOP=0
echo "R5 FUSED AB DONE"
