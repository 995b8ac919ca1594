"""Summarize a jax.profiler xplane trace: top device ops by self time.

Parses the xplane.pb directly (the tensorboard_plugin_profile converter is
incompatible with the installed TF), walks the TPU device plane and sums
event durations by op name.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python bench/read_trace.py /tmp/prof_vae [N] [name-filter]
"""
from __future__ import annotations

import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main() -> None:
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {root}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    print(f"{len(paths)} xplane file(s); using {paths[-1]}")
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        emeta = plane.event_metadata
        agg: dict[str, float] = {}
        count: dict[str, int] = {}
        total = 0.0
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/derived lines
            if "step" in lname or "xla modules" in lname:
                continue
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # -> ms
                agg[name] = agg.get(name, 0.0) + dur
                count[name] = count.get(name, 0) + 1
                total += dur
        if not agg:
            continue
        print(f"\n== plane {plane.name}: {total:.1f} ms total op time ==")
        for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {t/total*100:5.1f}%  {t:9.2f} ms  x{count[name]:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
