"""Offline analyzer for a jax.profiler chrome trace (TPU device lanes).

Prints per-lane totals and the top-N individual HLO ops by accumulated
duration, so parent spans (modules, while bodies) can be told apart from leaf
ops.  Usage: python tools/trace_report.py /tmp/jax_trace [topn]
"""

import collections
import glob
import gzip
import json
import os
import sys


def main():
    trace_dir = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    lane_tot = collections.Counter()
    lane_n = collections.Counter()
    op_tot = collections.defaultdict(float)
    op_n = collections.Counter()
    op_lane = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = f'{pid_names.get(e["pid"], e["pid"])}/' \
               f'{tid_names.get((e["pid"], e["tid"]), e["tid"])}'
        dur = e.get("dur", 0) / 1e3
        lane_tot[lane] += dur
        lane_n[lane] += 1
        name = e.get("name", "?")
        op_tot[(lane, name)] += dur
        op_n[(lane, name)] += 1
        op_lane[(lane, name)] = lane

    print("== lanes ==")
    for k, v in lane_tot.most_common(20):
        print(f"  {v:9.1f} ms  {lane_n[k]:7d} ev  {k}")

    print(f"\n== top {topn} (lane, op) by total duration ==")
    for (lane, name), v in sorted(op_tot.items(), key=lambda kv: -kv[1])[:topn]:
        print(f"  {v:9.1f} ms  x{op_n[(lane, name)]:5d}  [{lane.split('/')[-1]}] {name[:110]}")


if __name__ == "__main__":
    main()
