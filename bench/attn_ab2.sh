#!/bin/bash
# Round-3 attention A/B (run AFTER bench/healthy_runbook.sh completes, on a
# still-healthy window): baseline staticmax vs NOPAD (pad-free ceil-grid KV
# sweep) vs SKEW2 (MXU/VPU skew) vs the combination. ONE TPU process at a
# time. Usage: bash bench/attn_ab2.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/attn_ab2.log}"
: > "$LOG"   # truncate: followers parse line positions, stale runs mislead

PROBE=$(python bench/compile_probe.py 2>/dev/null | tail -1)
echo "probe: $PROBE" | tee -a "$LOG"
if ! echo "$PROBE" | grep -q HEALTHY; then
    echo "compile service SICK — refusing" | tee -a "$LOG"
    exit 1
fi

run() {
    echo "== $* ==" | tee -a "$LOG"
    env "$@" timeout 1800 python bench/attn_micro.py --iters 50 2>/dev/null \
        | tail -1 | tee -a "$LOG"
}

run RTV_DUMMY=0                       # baseline staticmax
run RTV_ATTN_NOPAD=1
run RTV_ATTN_SKEW2=1
run RTV_ATTN_SKEW2=1 RTV_ATTN_NOPAD=1 # combined (NOPAD wired into skew2)
echo "attn_ab2 done: $LOG"
