#!/bin/bash
# Follow-up to bench/healthy_runbook.sh: once the runbook prints RUNBOOK DONE
# (bench recompiled healthy + conv sweep + skew2 A/B), run the round-3
# additions that postdate it:
#   1. bench/attn_ab2.sh  — staticmax baseline vs RTV_ATTN_NOPAD vs SKEW2
#   2. if NOPAD beats baseline standalone by >2%, a fused bench.py A/B with
#      RTV_ATTN_NOPAD=1 (standalone stage wins don't count — CLAUDE.md rule)
# ONE TPU process at a time: waits for /tmp/tpu_loop.pid to clear.
# Usage: nohup bash bench/runbook_followup.sh > /tmp/followup.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

while [ -f /tmp/tpu_loop.pid ] || ! grep -q "RUNBOOK DONE" /tmp/runbook.log 2>/dev/null; do
    sleep 120
done
echo $$ > /tmp/tpu_loop.pid
echo "$(date -u +%H:%M:%S) runbook done — running attn_ab2"

bash bench/attn_ab2.sh /tmp/attn_ab2.log
# lines look like: "pallas bq=.. bkm=.. bk=..: 2.423 ms/layer-attn  (...)"
BASE=$(grep "ms/layer" /tmp/attn_ab2.log | sed -n 1p | sed -n 's/.*: \([0-9.]*\) ms.*/\1/p')
NOPAD=$(grep "ms/layer" /tmp/attn_ab2.log | sed -n 2p | sed -n 's/.*: \([0-9.]*\) ms.*/\1/p')
echo "baseline=${BASE:-?} nopad=${NOPAD:-?}"
if [ -n "${BASE:-}" ] && [ -n "${NOPAD:-}" ] && \
   python -c "import sys; sys.exit(0 if float('$NOPAD') < 0.98*float('$BASE') else 1)"; then
    echo "NOPAD wins standalone — fused bench A/B"
    RTV_ATTN_NOPAD=1 timeout 7200 python bench.py \
        > /tmp/bench_nopad.json 2> /tmp/bench_nopad.log
    echo "fused NOPAD: $(cat /tmp/bench_nopad.json)"
else
    echo "NOPAD did not win standalone — skipping fused A/B"
fi

rm -f /tmp/tpu_loop.pid
echo "FOLLOWUP DONE"
