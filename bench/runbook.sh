#!/bin/bash
# THE single TPU runbook entry point (consolidates round-2/3's
# healthy_runbook / runbook_followup / profile_after / secure_chain —
# VERDICT r3 #8). ONE TPU process at a time; every mode writes
# /tmp/tpu_loop.pid while it owns the chip.
#
# Modes:
#   probe    — one compile-service health probe (cheap, ~1 min healthy)
#   secure   — bench/secure_number_loop.sh: poll for a window, recompile
#              current-HEAD bench programs, keep the cache only when the
#              fused bench reads >= SECURE_MIN_FPS (fps-gated, not probe-gated)
#   sweep    — conv-formulation sweep + pick + fused A/B (probe-gated)
#   attn     — attention A/B: staticmax vs NOPAD vs SKEW2 vs combined,
#              + fused NOPAD bench if it wins standalone (probe-gated)
#   profile  — profiled 2-block bench on the (secured) cache + trace summary
#   ab FLAG [polls] — generic fused A/B of one env-gated variant: poll until
#              a fresh-compile probe reads HEALTHY (default 12 x 10 min),
#              then run bench.py with FLAG=1 into /tmp/bench_FLAG.json.
#              Variant traces differ from the secured default programs, so a
#              sick compile cannot clobber the headline cache.
#   chain    — secure -> sweep -> attn -> profile (the full unattended plan)
#
# Usage: nohup bash bench/runbook.sh chain > /tmp/runbook_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
MODE="${1:-chain}"

probe() { timeout 900 python bench/compile_probe.py 2>/dev/null | tail -1; }

do_attn() {
    timeout 7200 bash bench/attn_ab2.sh /tmp/attn_ab2.log || return 0
    # fused A/B for a standalone winner (standalone wins don't decide
    # defaults — CLAUDE.md measurement rules). NOPAD/SKEW2 traces differ
    # from the secured default programs, so a sick-window compile here
    # cannot clobber them.
    local BASE NOPAD
    BASE=$(grep "ms/layer" /tmp/attn_ab2.log | sed -n 1p | sed -n 's/.*: \([0-9.]*\) ms.*/\1/p')
    NOPAD=$(grep "ms/layer" /tmp/attn_ab2.log | sed -n 2p | sed -n 's/.*: \([0-9.]*\) ms.*/\1/p')
    if [ -n "${BASE:-}" ] && [ -n "${NOPAD:-}" ] && \
       python -c "import sys; sys.exit(0 if float('$NOPAD') < 0.98*float('$BASE') else 1)"; then
        echo "NOPAD wins standalone ($NOPAD vs $BASE) — fused A/B"
        RTV_ATTN_NOPAD=1 RTV_BENCH_HEALTH_WAIT_S=120 timeout 7200 python bench.py \
            > /tmp/bench_nopad.json 2> /tmp/bench_nopad.log
        echo "fused NOPAD: $(cat /tmp/bench_nopad.json 2>/dev/null)"
    fi
}

do_profile() {
    rm -rf /tmp/rtv_trace_r4
    RTV_PROFILE_DIR=/tmp/rtv_trace_r4 RTV_BENCH_BLOCKS=2 RTV_BENCH_HEALTH_WAIT_S=60 \
        timeout 7200 python bench.py > /tmp/bench_profiled.json 2> /tmp/bench_profiled.log
    echo "profiled bench: $(cat /tmp/bench_profiled.json 2>/dev/null)"
    python bench/read_trace.py /tmp/rtv_trace_r4 60 > /tmp/trace_summary_r4.txt 2>&1
    tail -30 /tmp/trace_summary_r4.txt 2>/dev/null
}

case "$MODE" in
probe)
    probe ;;
secure)
    bash bench/secure_number_loop.sh ;;
sweep)
    bash bench/run_conv_sweep.sh /tmp/conv_sweep.log ;;
attn)
    echo $$ > /tmp/tpu_loop.pid
    do_attn
    rm -f /tmp/tpu_loop.pid ;;
profile)
    echo $$ > /tmp/tpu_loop.pid
    do_profile
    rm -f /tmp/tpu_loop.pid ;;
ab)
    VAR="${2:?usage: runbook.sh ab RTV_FLAG [max_polls]}"
    POLLS="${3:-12}"
    echo $$ > /tmp/tpu_loop.pid
    for i in $(seq 1 "$POLLS"); do
        P=$(probe); echo "poll $i: $P"
        if echo "$P" | grep -q HEALTHY; then
            env "$VAR=1" RTV_BENCH_HEALTH_WAIT_S=120 timeout 7200 python bench.py \
                > "/tmp/bench_${VAR}.json" 2> "/tmp/bench_${VAR}.log"
            echo "fused $VAR: $(cat "/tmp/bench_${VAR}.json" 2>/dev/null)"
            break
        fi
        [ "$i" -lt "$POLLS" ] && sleep 600
    done
    rm -f /tmp/tpu_loop.pid ;;
chain)
    echo "== stage A: secure the headline cache =="
    bash bench/secure_number_loop.sh
    echo $$ > /tmp/tpu_loop.pid

    echo "== stage B: conv sweep (probe-gated inside) =="
    timeout 14400 bash bench/run_conv_sweep.sh /tmp/conv_sweep.log || \
        echo "sweep skipped/failed (probe sick or timeout)"

    P=$(probe)
    echo "post-sweep probe: $P"
    if echo "$P" | grep -q HEALTHY; then
        echo "== stage C: attention A/Bs =="
        do_attn
    else
        echo "attn A/B skipped (probe sick)"
    fi

    echo "== stage D: profiled bench on the secured cache =="
    do_profile
    rm -f /tmp/tpu_loop.pid
    echo "CHAIN DONE" ;;
*)
    echo "unknown mode '$MODE' (probe|secure|sweep|attn|profile|chain)" >&2
    exit 2 ;;
esac
