"""Summarize a committed jax.profiler trace into a per-op-class time table.

Reads the Chrome-trace JSON (vm.trace.json.gz) that `-profile DIR` /
utils.logging.profile_trace writes, keeps only the device lane, strips the
program/loop parent events, and aggregates child op durations by XLA op
class (fusion, copy, concatenate, reshape, ...). This is the analysis
behind RESULTS.md's MNIST-EDDI step breakdown (54% matmul-class /
17% layout / 11% elementwise / 10% flat-grad concat).

Usage:
    python3 tools/profile_summary.py profiles/mnist_eddi_r3b
    python3 tools/profile_summary.py <trace.json.gz>
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if path.endswith(".json.gz"):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return hits[-1]


def summarize(trace_path: str):
    data = json.loads(gzip.open(trace_path).read())
    events = data.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in (e.get("args", {}).get("name") or "")
    }
    if not device_pids:  # CPU-only trace: fall back to any non-host lane
        device_pids = {
            e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "host" not in (e.get("args", {}).get("name") or "").lower()
        }
    cls = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        # parents (whole-program / loop events) would double-count children
        if (name.startswith("jit_") or name.startswith("while")
                or name.isdigit()):
            continue
        base = re.sub(r"[.\d]+$", "", name)
        cls[base] += e.get("dur", 0)
        cnt[base] += 1
    return cls, cnt


def main():
    trace = find_trace(sys.argv[1] if len(sys.argv) > 1
                       else "profiles/mnist_eddi_r3b")
    cls, cnt = summarize(trace)
    total = sum(cls.values())
    print(f"{trace}: device child-op time {total/1e3:.1f} ms")
    print(f"{'share':>7} {'time_us':>10} {'events':>7}  op class")
    for name, d in cls.most_common(25):
        print(f"{100 * d / total:6.1f}% {d:>10.0f} {cnt[name]:>7}  {name}")


if __name__ == "__main__":
    main()
