#!/bin/bash
# Healthy-window runbook (VERDICT r2 #1/#2/#5): poll the compile service;
# the moment a probe comes back genuinely healthy, (a) purge cache entries
# poisoned by the 2026-08-16 23:40+ sick window, (b) re-run bench.py so every
# model executable recompiles healthy and the recorded fps reflects the chip,
# (c) run the conv-formulation sweep, (d) A/B the skew2 attention variant.
#
# ONE TPU process at a time: while this loop is alive nothing else may touch
# the TPU. It writes its pid to /tmp/tpu_loop.pid and stage logs under /tmp.
# Usage: nohup bash bench/healthy_runbook.sh > /tmp/runbook.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_loop.pid
POLL_S="${RUNBOOK_POLL_S:-1500}"
# "healthy enough to adopt": fresh-compiled 2k matmul above this. The healthy
# calibration is ~190 (4k) — poisoned windows produce 11-45; the half-sick
# window produced 137-level executables. 150 separates them.
MIN_TF="${RUNBOOK_MIN_TF:-150}"

probe_tf() {
    local out
    out=$(python bench/compile_probe.py 2>/dev/null | tail -1)
    echo "$(date -u +%H:%M:%S) probe: $out" >> /tmp/runbook_probes.log
    echo "$out" | sed -n 's/.*exec \([0-9]*\) TFLOP.*/\1/p'
}

while true; do
    TF=$(probe_tf)
    if [ -n "${TF:-}" ] && [ "$TF" -ge "$MIN_TF" ]; then
        echo "HEALTHY window (fresh-compile $TF TFLOP/s) — running the plan"
        break
    fi
    echo "$(date -u +%H:%M:%S) sick or unreadable (tf=${TF:-?}) — sleeping $POLL_S"
    sleep "$POLL_S"
done

echo "== backup cache, then purge entries newer than 2026-08-16 23:40 =="
# hardlink clone: if the service relapses mid-recompile we'd otherwise hold
# poisoned executables AND have deleted the old (working, 8.2 fps) programs
rm -rf ~/.rtv_jax_cache.bak
cp -al ~/.rtv_jax_cache ~/.rtv_jax_cache.bak 2>/dev/null
find ~/.rtv_jax_cache -newermt "2026-08-16 23:40" -type f -delete 2>/dev/null
echo "remaining cache entries: $(find ~/.rtv_jax_cache -type f | wc -l)"

echo "== bench.py full recompile (healthy executables) =="
RTV_BENCH_HEALTH_WAIT_S=120 timeout 7200 python bench.py \
    > /tmp/bench_healthy.json 2> /tmp/bench_healthy.log
echo "bench: $(cat /tmp/bench_healthy.json)"
FPS=$(python - <<'EOF'
import json
try:
    print(json.load(open("/tmp/bench_healthy.json"))["value"])
except Exception:
    print(0)
EOF
)
if python -c "import sys; sys.exit(0 if float('$FPS' or 0) < 7.5 else 1)"; then
    echo "bench fps $FPS < 7.5 — service relapsed mid-recompile; RESTORING old cache"
    rm -rf ~/.rtv_jax_cache
    mv ~/.rtv_jax_cache.bak ~/.rtv_jax_cache
else
    echo "bench fps $FPS — keeping recompiled cache"
    rm -rf ~/.rtv_jax_cache.bak
fi

echo "== conv-formulation sweep =="
timeout 10800 bash bench/run_conv_sweep.sh /tmp/conv_sweep.log

echo "== attention skew2 A/B =="
TF=$(probe_tf)
if [ -n "${TF:-}" ] && [ "$TF" -ge "$MIN_TF" ]; then
    timeout 1800 python bench/attn_micro.py --iters 50 \
        2>/dev/null | tail -1 | tee /tmp/attn_ab.log
    RTV_ATTN_SKEW2=1 timeout 1800 python bench/attn_micro.py --iters 50 \
        2>/dev/null | tail -1 | tee -a /tmp/attn_ab.log
    for bk in 512 2048; do
        RTV_ATTN_SKEW2=1 RTV_ATTN_SKEW2_BK=$bk timeout 1800 \
            python bench/attn_micro.py --iters 50 2>/dev/null \
            | tail -1 | tee -a /tmp/attn_ab.log
    done
else
    echo "window closed before attn A/B (tf=${TF:-?})"
fi

rm -f /tmp/tpu_loop.pid
echo "RUNBOOK DONE"
