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

run_arm() {
    echo "== $1 $2 ==" | tee -a "$LOG"
    python bench/conv_micro.py --shape "$1" --variant "$2" 2>/dev/null \
        | tail -1 | tee -a "$LOG"
}

# healthy windows are short and close without warning (2026-08-17: quality
# flipped within minutes) — answer the PRODUCTION questions first. The
# serving tier is int8 (VAE decoder AND the T=1 re-encode encoder), and 96ch
# is ~2/3 of decode FLOPs, so: int8 arms at every shape, then enc int8 arms,
# then the bf16/exploratory arms.
for shape in 96 192 384; do
    for v in int8 int8shifted int8wcol; do run_arm "$shape" "$v"; done
done
for shape in enc96 enc192 enc384; do
    for v in int8 int8shifted int8wcol; do run_arm "$shape" "$v"; done
done
for shape in 96 192 384; do
    for v in conv threeconv shifted wcol im2col phase; do run_arm "$shape" "$v"; done
done
for shape in enc96 enc192 enc384; do
    for v in conv shifted wcol; do run_arm "$shape" "$v"; done
done
echo "sweep done: $LOG"
