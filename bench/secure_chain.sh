#!/bin/bash
# Unattended round-3 TPU chain, v2 (supersedes healthy_runbook/followup/
# profile_after — gate on measured fps, not probes):
#   A. bench/secure_number_loop.sh — recompile current-HEAD bench programs,
#      keep the cache only when the fused bench itself reads >= 8.0 fps
#      (probe-healthy windows have produced 4.675-fps executables).
#   B. if a window is still usable afterwards: conv-formulation sweep +
#      attention A/Bs (self-gated on compile_probe).
#   C. profiled 2-block bench on the secured cache (cached programs execute
#      at full speed even when fresh compiles are sick) + trace summary.
# ONE TPU process at a time; stages hand off sequentially in this script.
# Usage: nohup bash bench/secure_chain.sh > /tmp/secure_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "== stage A: secure the headline cache =="
bash bench/secure_number_loop.sh
echo $$ > /tmp/tpu_loop.pid

echo "== stage B: conv sweep + attention A/Bs (probe-gated) =="
timeout 14400 bash bench/run_conv_sweep.sh /tmp/conv_sweep.log || \
    echo "sweep skipped/failed (probe sick or timeout)"
PROBE=$(python bench/compile_probe.py 2>/dev/null | tail -1)
echo "post-sweep probe: $PROBE"
if echo "$PROBE" | grep -q HEALTHY; then
    timeout 7200 bash bench/attn_ab2.sh /tmp/attn_ab2.log || true
    tail -6 /tmp/attn_ab2.log 2>/dev/null
    # fused A/B for any standalone winner (standalone wins don't decide
    # defaults — CLAUDE.md measurement rules). NOPAD/SKEW2 traces differ from
    # the secured default programs, so a sick-window compile here cannot
    # clobber them.
    BASE=$(grep "ms/layer" /tmp/attn_ab2.log | sed -n 1p | sed -n 's/.*: \([0-9.]*\) ms.*/\1/p')
    NOPAD=$(grep "ms/layer" /tmp/attn_ab2.log | sed -n 2p | sed -n 's/.*: \([0-9.]*\) ms.*/\1/p')
    if [ -n "${BASE:-}" ] && [ -n "${NOPAD:-}" ] && \
       python -c "import sys; sys.exit(0 if float('$NOPAD') < 0.98*float('$BASE') else 1)"; then
        echo "NOPAD wins standalone ($NOPAD vs $BASE) — fused A/B"
        RTV_ATTN_NOPAD=1 RTV_BENCH_HEALTH_WAIT_S=120 timeout 7200 python bench.py \
            > /tmp/bench_nopad.json 2> /tmp/bench_nopad.log
        echo "fused NOPAD: $(cat /tmp/bench_nopad.json 2>/dev/null)"
    fi
else
    echo "attn A/B skipped (probe sick)"
fi

echo "== stage C: profiled bench on the secured cache =="
rm -rf /tmp/rtv_trace_r3
RTV_PROFILE_DIR=/tmp/rtv_trace_r3 RTV_BENCH_BLOCKS=2 RTV_BENCH_HEALTH_WAIT_S=60 \
    timeout 7200 python bench.py > /tmp/bench_profiled.json 2> /tmp/bench_profiled.log
echo "profiled bench: $(cat /tmp/bench_profiled.json 2>/dev/null)"
python bench/read_trace.py /tmp/rtv_trace_r3 60 > /tmp/trace_summary_r3.txt 2>&1
tail -30 /tmp/trace_summary_r3.txt 2>/dev/null

rm -f /tmp/tpu_loop.pid
echo "CHAIN DONE"
