"""Parse a jax.profiler vm.trace.json.gz: per-op SELF time on the device
timeline, grouped by op name prefix and source attribution.

Usage: python experiments/parse_trace.py <trace.json.gz> [top_n]
"""
import gzip
import json
import re
import sys
from collections import defaultdict


def main(path, top_n=30):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    # find the device "XLA Ops" lane via thread_name metadata
    tmeta = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tmeta[(e.get("pid"), e.get("tid"))] = e.get("args", {}).get(
                "name", "")
    xs = [e for e in ev if e.get("ph") == "X" and "dur" in e]
    lanes = defaultdict(list)
    for e in xs:
        lanes[(e.get("pid"), e.get("tid"))].append(e)
    op_lanes = [k for k in lanes if tmeta.get(k) == "XLA Ops"]
    if op_lanes:
        lane = max((lanes[k] for k in op_lanes),
                   key=lambda v: sum(e["dur"] for e in v))
    else:
        lane = max(lanes.values(), key=lambda v: sum(e["dur"] for e in v))
    lane.sort(key=lambda e: (e["ts"], -(e["dur"])))
    # self time via interval nesting (stack sweep)
    total = defaultdict(float)
    self_t = defaultdict(float)
    src_t = defaultdict(float)
    stack = []
    for e in lane:
        ts, dur = e["ts"], e["dur"]
        while stack and ts >= stack[-1][1]:
            stack.pop()
        name = e["name"]
        total[name] += dur
        self_t[name] += dur
        if stack:
            self_t[stack[-1][2]] -= dur
        args = e.get("args", {})
        src = args.get("source") or args.get("tf_op") or ""
        if src:
            src_t[(name.split(".")[0], src)] += dur
        stack.append((ts, ts + dur, name))
    grand = sum(max(v, 0.0) for v in self_t.values())
    print(f"lane events: {len(lane)}  total self us: {grand:.0f}")
    rows = sorted(self_t.items(), key=lambda kv: -kv[1])[:top_n]
    for name, t in rows:
        if t <= 0:
            continue
        print(f"{t/1e3:9.2f} ms  {100*t/grand:5.1f}%  {name[:110]}")
    print("\n-- by (op-prefix, source) --")
    rows = sorted(src_t.items(), key=lambda kv: -kv[1])[:top_n]
    for (pfx, src), t in rows:
        print(f"{t/1e3:9.2f} ms  {pfx[:40]:40s} {src[:70]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
