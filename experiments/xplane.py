"""Parse a jax.profiler xplane.pb dump into device-time opcode buckets.

Round-2/3 perf work runs on opcode-level breakdowns of the train step
(PERF_NOTES.md); this makes that analysis a one-liner:

    python experiments/xplane.py /tmp/trace_dir [--top 30]

Uses the xplane proto vendored inside tensorflow (tsl); no profiler UI
needed.  Device time is summed per HLO opcode (from the "tf_op"/"hlo_op"
metadata when present, else the event name prefix).
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys


def _load_xplane(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def find_xplane(trace_dir: str) -> str:
    cands = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not cands:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    return max(cands, key=os.path.getmtime)


_OPCODE = re.compile(r"^%?([a-zA-Z][a-zA-Z0-9_-]*?)(?:[.\d]|$)")


def device_op_table(trace_dir: str):
    """Returns (total_device_ns, [(opcode, ns, count)], [(event_name, ns, count)])."""
    xs = _load_xplane(find_xplane(trace_dir))
    by_opcode = collections.Counter()
    count_opcode = collections.Counter()
    by_name = collections.Counter()
    count_name = collections.Counter()
    total = 0
    for plane in xs.planes:
        # TPU device planes: "/device:TPU:0" or "TPU:0"; skip host threads
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        if "Steps" in plane.name:
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            # XLA Ops lines carry per-HLO events; "XLA Modules" lines carry
            # whole-module spans (would double count)
            if "module" in line.name.lower():
                continue
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur = ev.duration_ps // 1000  # ps -> ns
                m = _OPCODE.match(name)
                op = m.group(1) if m else name
                by_opcode[op] += dur
                count_opcode[op] += 1
                by_name[name] += dur
                count_name[name] += 1
                total += dur
    ops = sorted(((k, v, count_opcode[k]) for k, v in by_opcode.items()),
                 key=lambda t: -t[1])
    names = sorted(((k, v, count_name[k]) for k, v in by_name.items()),
                   key=lambda t: -t[1])
    return total, ops, names


def main():
    trace_dir = sys.argv[1]
    top = int(sys.argv[2].split("=")[-1]) if len(sys.argv) > 2 else 25
    total, ops, names = device_op_table(trace_dir)
    print(f"total device time: {total/1e6:.2f} ms")
    print("\n-- by opcode --")
    for k, v, c in ops[:top]:
        print(f"{v/1e6:9.2f} ms  x{c:5d}  {k}")
    print("\n-- top events --")
    for k, v, c in names[:top]:
        print(f"{v/1e6:9.2f} ms  x{c:5d}  {k[:110]}")


if __name__ == "__main__":
    main()
