"""Parse a jax.profiler xplane.pb and print top device ops by self time.

tensorboard_plugin_profile's converter is version-incompatible with the
installed TF, so this aggregates the device-plane XEvents directly.

Usage: python scripts/xplane_top_ops.py <trace.xplane.pb> [top_n]
"""
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    print("planes:", [p.name for p in xs.planes], file=sys.stderr)
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps / 1e9   # ms
                cnt[name] += 1
        grand = sum(tot.values())
        print(f"\n== {plane.name}  (total {grand:.2f} ms over all lines)")
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"{ms:10.3f} ms  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
