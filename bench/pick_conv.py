"""Pick conv-formulation winners from a run_conv_sweep.sh log and emit the
RTV_VAE_CONV map to adopt them.

The sweep measures decoder res-block convs (tap-merged, ci=3C) at shapes
96/192/384 and encoder T=1 convs (tap-skip re-encode, ci=C) at enc96/192/384
(bench/conv_micro.py SHAPES). Map keys are "CIxCO" (models/vae.py
_variant_for), so decoder and encoder winners at the same Cout don't collide.

Usage: python bench/pick_conv.py /tmp/conv_sweep.log
       python bench/pick_conv.py /tmp/conv_sweep.log --map
           # emit ONLY the int8-tier (serving) RTV_VAE_CONV map value with
           # production formulations, or nothing if conv wins everywhere —
           # consumed by run_conv_sweep.sh to drive the fused-bench A/B
"""
from __future__ import annotations

import re
import sys

# conv_micro label -> (is_int8_tier, formulation for the RTV_VAE_CONV map)
VARIANTS = {
    "conv": (False, "conv"),
    "threeconv": (False, "threeconv"),
    "shifted": (False, "shifted"),
    "wcol": (False, "wcol"),
    "im2col": (False, "im2col"),
    "phase": (False, "phase"),
    "int8": (True, "conv"),
    "int8shifted": (True, "shifted"),
    "int8wcol": (True, "wcol"),
    "int8phase": (True, "phase"),
}
LINE = re.compile(r"^(enc)?(\d+)ch (\w+): ([0-9.]+) ms/conv")


PRODUCTION_FORMS = ("conv", "shifted", "wcol", "threeconv", "im2col", "phase")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    map_only = "--map" in sys.argv
    path = args[0] if args else "/tmp/conv_sweep.log"
    results: dict = {}  # (enc, C, int8) -> list[(ms, formulation, label)]
    for line in open(path):
        m = LINE.match(line.strip())
        if not m:
            continue
        enc, c, label, ms = bool(m[1]), int(m[2]), m[3], float(m[4])
        if label not in VARIANTS:
            continue
        int8, form = VARIANTS[label]
        results.setdefault((enc, c, int8), []).append((ms, form, label))

    if not results:
        if not map_only:
            print(f"no sweep lines in {path}")
        return
    if map_only:
        # serving tier = int8; only formulations models/vae.py implements
        # (a non-production name would silently run as "conv" — measuring
        # nothing). >2% standalone win required to bother the fused bench.
        entries = []
        for (enc, c, int8), arms in sorted(results.items()):
            if not int8:
                continue
            arms.sort()
            prod = [a for a in arms if a[1] in PRODUCTION_FORMS]
            if not prod:
                continue
            best_ms, form, _ = prod[0]
            base = next((a for a in prod if a[1] == "conv"), None)
            if form != "conv" and base is not None and best_ms < 0.98 * base[0]:
                key = f"{c}x{c}" if enc else f"{3 * c}x{c}"
                entries.append(f"{key}:{form}")
        if entries:
            print(",".join(entries) + ",default:conv")
        return
    for tier in (True, False):
        entries = []
        print(f"-- {'int8' if tier else 'bf16'} tier --")
        for (enc, c, int8), arms in sorted(results.items()):
            if int8 != tier:
                continue
            arms.sort()
            best_ms, form, label = arms[0]
            base = next((a for a in arms if a[1] == "conv"), arms[-1])
            key = f"{c}x{c}" if enc else f"{3 * c}x{c}"
            print(f"  {'enc' if enc else 'dec'} {c}ch: {label} "
                  f"{best_ms:.3f} ms (conv baseline {base[0]:.3f}, "
                  f"{base[0] / best_ms:.2f}x)")
            if form != "conv":
                if form not in PRODUCTION_FORMS:
                    # sweep-only exploration arm; models/vae.py silently runs
                    # "conv" for unknown names — port the formulation first
                    print(f"    NOTE: {form} wins but is NOT a production "
                          "formulation yet (implement in models/vae.py first)")
                entries.append(f"{key}:{form}")
        if entries:
            print(f'  adopt: RTV_VAE_CONV="{",".join(entries)},default:conv"')
        else:
            print("  adopt: (default conv wins everywhere)")


if __name__ == "__main__":
    main()
