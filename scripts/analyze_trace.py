"""Aggregate device op time from a jax.profiler xplane trace.

Usage: python scripts/analyze_trace.py <trace.xplane.pb> [top_n]
Parses the XSpace proto directly (the tensorboard profile plugin's
converters are version-locked to a different TF build).
"""

import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        total_by_name = defaultdict(float)
        count_by_name = defaultdict(int)
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        plane_total = 0.0
        for line in plane.lines:
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                total_by_name[name] += dur
                count_by_name[name] += 1
                plane_total += dur
        if not total_by_name:
            continue
        print(f"== plane: {plane.name}  total XLA-op time {plane_total:.1f} ms"
              f" (over all traced steps)")
        items = sorted(total_by_name.items(), key=lambda kv: -kv[1])
        for name, ms in items[:top_n]:
            print(f"{ms:9.2f} ms  x{count_by_name[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
