#!/bin/bash
# Round-5 unattended TPU chain (VERDICT r4 #3 + #4 + #6). History:
#   stage 0 (DONE 14:47) — default bench warm-cache: 9.122 fps / ttff 562.2 /
#     cold_start 493.6 s (cal-cache miss; stage-2 re-measures primed).
#   stage 0b (DONE 14:58) — Element-window conv kernel COMPILE smoke: OK.
#   same-window controls (DONE 15:20, SICK ~50 TF/s cap): iters=30 fresh-vs-
#     fresh at 384: int8pallas 8.08 / int8shifted 7.34 / conv 7.56 / int8
#     8.22 ms — all clamped at the window ceiling; ranking needs HEALTHY.
# Remaining plan: poll HEALTHY, then (a) conv kernel micro A/B, (b) fused
# int8-linear kernel micro A/B, (c) the three quantise-knob fused benches,
# (d) fused kernel benches if micros win, (e) default re-measure.
# ONE TPU process at a time; /tmp/tpu_loop.pid while the chip is owned.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_loop.pid
trap 'rm -f /tmp/tpu_loop.pid' EXIT

probe() { timeout 1800 python bench/compile_probe.py 2>/dev/null | tail -1; }

run_bench() { # run_bench NAME [ENV=VAL ...]
    local NAME="$1"; shift
    echo "== bench $NAME ($(date -u +%H:%M)) env: $* =="
    env "$@" RTV_BENCH_HEALTH_WAIT_S=60 timeout 7200 python bench.py \
        > "/tmp/bench_r5_${NAME}.json" 2> "/tmp/bench_r5_${NAME}.log"
    echo "bench $NAME: $(cat /tmp/bench_r5_${NAME}.json 2>/dev/null)"
}

cm() { timeout 3600 python bench/conv_micro.py "$@" 2>/dev/null | tail -1; }
im() { timeout 3600 python bench/int8_mm_micro.py "$@" 2>/dev/null | tail -1; }

POLLS="${1:-60}"
for i in $(seq 1 "$POLLS"); do
    P=$(probe); echo "poll $i ($(date -u +%H:%M)): $P"
    if echo "$P" | grep -q HEALTHY; then
        echo "== stage A: conv kernel micro A/B ($(date -u +%H:%M)) =="
        {
        for SH in 384 96 192 enc96 enc384; do
            cm --shape "$SH" --variant int8pallas --iters 30 --salt 2e-6
            cm --shape "$SH" --variant pallas --iters 30 --salt 2e-6
            cm --shape "$SH" --variant int8shifted --iters 30 --salt 2e-6
            cm --shape "$SH" --variant conv --iters 30 --salt 2e-6
        done
        } | tee /tmp/r5_conv_healthy.log
        echo "probe: $(probe)"

        echo "== stage B: int8 linear kernel micro A/B ($(date -u +%H:%M)) =="
        {
        for SH in fc1 fc2 qkv; do
            im --shape "$SH" --variant pallas --iters 30 --salt 1e-6
            im --shape "$SH" --variant xla --iters 30 --salt 1e-6
        done
        im --shape fc1 --variant bf16 --iters 30 --salt 1e-6
        } | tee /tmp/r5_int8mm_healthy.log
        echo "probe: $(probe)"

        echo "== stage C: quantise-knob fused A/Bs =="
        for VARSPEC in "qbf16 RTV_Q_BF16=1" "qrcp RTV_Q_RCP=1" \
                       "amaxsub RTV_BENCH_INT8_DIT_STATIC=0 RTV_DIT_AMAX_SUB=4"; do
            set -- $VARSPEC; NAME="$1"; shift
            run_bench "$NAME" "$@"
            echo "probe after $NAME: $(probe)"
        done

        echo "== stage D: fused kernel benches (evidence in the micro logs) =="
        if python - <<'PY'
import re, sys
t = open("/tmp/r5_int8mm_healthy.log").read()
g = dict(re.findall(r"(\S+ \S+): ([0-9.]+) ms", t))
try:
    win = float(g["fc1 pallas"]) < 0.95 * float(g["fc1 xla"])
except KeyError:
    win = False
sys.exit(0 if win else 1)
PY
        then
            run_bench pallasmm RTV_DIT_PALLAS_MM=1
            echo "probe after pallasmm: $(probe)"
        else
            echo "int8 mm kernel did not win its micro; fused bench skipped"
        fi
        if python - <<'PY'
import re, sys
t = open("/tmp/r5_conv_healthy.log").read()
g = dict(re.findall(r"(\S+ \S+): ([0-9.]+) ms", t))
best = None
for sh in ("384ch", "96ch", "192ch"):
    try:
        if float(g[f"{sh} int8pallas"]) < 0.95 * min(
                float(g[f"{sh} int8shifted"]), float(g[f"{sh} conv"])):
            best = sh
    except KeyError:
        pass
sys.exit(0 if best else 1)
PY
        then
            run_bench pallasconv "RTV_VAE_CONV=pallas"
            echo "probe after pallasconv: $(probe)"
        else
            echo "conv kernel did not win its micro; fused bench skipped"
        fi

        echo "== stage E: default re-measure (window control + primed cold start) =="
        run_bench default2 RTV_NOOP=0
        break
    fi
    [ "$i" -lt "$POLLS" ] && sleep 600
done
echo "R5 AB CHAIN DONE"
