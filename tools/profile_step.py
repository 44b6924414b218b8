"""Capture a device trace of the mesh-phase train step and summarize it.

Same workload as bench.py (800x800, 288^3 grid, 100k gaussians).  Writes a
jax.profiler trace, then parses the chrome-trace JSON to aggregate device op
durations by HLO op-name prefix — a poor man's op_profile that works without
tensorboard.  Used to hunt the gap between the full-step time and the sum of
individually-benchmarked components (see STATUS.md).

Usage:  python tools/profile_step.py [trace_dir]
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step():
    import jax
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp
    # single source of truth: the EXACT bench workload + knobs (bench.build
    # honors the same BENCH_* env overrides), so the persistent compile cache
    # is shared and the profiled graph is the benched graph.
    import bench
    step, state, batch = bench.build(jax, jnp)
    return jax, step, state, batch


def summarize(trace_dir):
    """Aggregate device-lane op durations from the chrome trace."""
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace.json.gz found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device XLA ops
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    buckets = collections.Counter()
    total = 0.0
    n_ops = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in lane.lower():  # steps lane double-counts
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        args = e.get("args", {}) or {}
        longname = args.get("long_name", "") or args.get("hlo_op", "") or name
        key = classify(name, longname)
        buckets[key] += dur
        total += dur
        n_ops += 1
    print(f"\n== device op time by bucket ({n_ops} ops, {total:.0f} ms total"
          f" across trace) ==")
    for k, v in buckets.most_common(40):
        print(f"  {v:9.1f} ms  {k}")

    # top individual ops (aggregated by name), with a snippet of long_name
    per_op = collections.Counter()
    op_long = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in lane.lower():
            continue
        name = e.get("name", "?")
        per_op[name] += e.get("dur", 0) / 1e3
        args = e.get("args", {}) or {}
        ln = args.get("long_name", "") or args.get("hlo_op", "")
        if ln and name not in op_long:
            op_long[name] = ln
    print("\n== top 45 ops by total time ==")
    for k, v in per_op.most_common(45):
        print(f"  {v:9.1f} ms  {k[:60]}  | {op_long.get(k, '')[:110]}")


def classify(name, longname):
    s = (name + " " + longname).lower()
    for key, pats in [
        ("fft (dpsr)", ["fft"]),
        ("sort", ["sort"]),
        ("conv", ["convolution"]),
        ("matmul/dot", ["dot", "matmul", "einsum"]),
        ("scatter", ["scatter"]),
        ("gather", ["gather"]),
        ("pallas composite", ["composite_kernel", "pallas"]),
        ("reduce", ["reduce"]),
        ("copy/transpose", ["copy", "transpose", "bitcast"]),
        ("cummax/scan", ["cummax", "cumsum", "while"]),
        ("iota/broadcast", ["iota", "broadcast"]),
        ("select/compare", ["select", "compare", "clamp"]),
    ]:
        if any(p in s for p in pats):
            return key
    if name.startswith("fusion") or "fusion" in s:
        return "fusion (elementwise etc.)"
    return name.split(".")[0][:40]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    jax, step, state, batch = build_step()
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    _, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    print(f"# compile+first: {time.time() - t0:.1f}s", flush=True)
    # warm (frozen state, same as bench.py)
    for _ in range(2):
        key, k = jax.random.split(key)
        _, metrics = step(state, batch, k)
    jax.block_until_ready(metrics["loss"])

    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            key, k = jax.random.split(key)
            _, metrics = step(state, batch, k)
        jax.block_until_ready(metrics["loss"])
    print(f"# traced 2 steps in {time.time() - t0:.2f}s", flush=True)
    summarize(trace_dir)


if __name__ == "__main__":
    main()
