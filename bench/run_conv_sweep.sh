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
    for v in int8 int8shifted int8wcol int8phase; do run_arm "$shape" "$v"; done
done
for shape in enc96 enc192 enc384; do
    for v in int8 int8shifted int8wcol int8phase; do run_arm "$shape" "$v"; done
done
for shape in 96 192 384; do
    for v in conv threeconv shifted wcol im2col phase; do run_arm "$shape" "$v"; done
done
for shape in enc96 enc192 enc384; do
    for v in conv shifted wcol; do run_arm "$shape" "$v"; done
done
echo "== pick ==" | tee -a "$LOG"
python bench/pick_conv.py "$LOG" | tee -a "$LOG"

# the arbiter: standalone wins don't decide defaults (CLAUDE.md measurement
# rules) — if the int8 serving tier picked a non-conv production formulation,
# run the FUSED bench with that map in the SAME healthy window so (a) the
# number is trustworthy and (b) the winning programs land in the persistent
# cache, making later default-flips cache hits.
MAP=$(python bench/pick_conv.py "$LOG" --map)
if [ -n "$MAP" ]; then
    echo "== fused A/B: RTV_VAE_CONV=$MAP ==" | tee -a "$LOG"
    RTV_VAE_CONV="$MAP" RTV_BENCH_HEALTH_WAIT_S=120 timeout 7200 \
        python bench.py > /tmp/bench_convmap.json 2> /tmp/bench_convmap.log
    echo "fused conv-map bench: $(cat /tmp/bench_convmap.json 2>/dev/null)" | tee -a "$LOG"
    echo "  (compare to /tmp/bench_secure.json; adopt by making this map the"
    echo "   RTV_VAE_CONV default if it wins — the programs are now cached)"
else
    echo "pick: default conv wins the int8 tier everywhere (no fused A/B)" | tee -a "$LOG"
fi
echo "sweep done: $LOG"
