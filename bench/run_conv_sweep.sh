#!/bin/bash
# Conv-formulation sweep, gated on a healthy compile service (VERDICT r2 #1).
# Probes first; refuses to run (and poison the compile cache) while sick.
# Usage: bash bench/run_conv_sweep.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/conv_sweep.log}"
: > "$LOG"   # truncate: bench/pick_conv.py parses this, stale runs mislead

echo "== probe ==" | tee -a "$LOG"
PROBE=$(python bench/compile_probe.py 2>/dev/null | tail -1)
echo "$PROBE" | tee -a "$LOG"
if ! echo "$PROBE" | grep -q HEALTHY; then
    echo "compile service SICK — refusing to sweep" | tee -a "$LOG"
    exit 1
fi

for shape in 96 192 384; do
    for v in conv threeconv shifted wcol im2col phase int8 int8shifted int8wcol; do
        echo "== $shape $v ==" | tee -a "$LOG"
        python bench/conv_micro.py --shape "$shape" --variant "$v" 2>/dev/null \
            | tail -1 | tee -a "$LOG"
    done
done

# encoder T=1 arms (the anti-drift re-encode shapes) — after the decoder
# arms so the primary question answers first if the window closes
for shape in enc96 enc192 enc384; do
    for v in conv shifted wcol int8 int8shifted int8wcol; do
        echo "== $shape $v ==" | tee -a "$LOG"
        python bench/conv_micro.py --shape "$shape" --variant "$v" 2>/dev/null \
            | tail -1 | tee -a "$LOG"
    done
done
echo "sweep done: $LOG"
