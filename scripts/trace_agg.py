"""Parse a jax.profiler chrome trace (works through the axon relay) and
aggregate per-HLO device time. Usage:

    python scripts/trace_agg.py /tmp/jxtrace [top_n]

or from another script:

    from trace_agg import device_events, aggregate
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def _latest_trace(root):
    cands = glob.glob(os.path.join(root, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not cands:
        raise FileNotFoundError(f"no trace under {root}")
    return max(cands, key=os.path.getmtime)


def device_events(root):
    """X events from the device pid(s) with their args (hlo_category,
    model_flops, raw_bytes_accessed, ...)."""
    path = _latest_trace(root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    # device pids: process_name metadata containing 'TPU' / 'Device'
    dev_pids = set()
    for e in ev:
        if (e.get("ph") == "M" and e.get("name") == "process_name"):
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "Device" in nm or "/device:" in nm:
                dev_pids.add(e["pid"])
    out = []
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            out.append(e)
    return out


def aggregate(events, key="hlo_category"):
    agg = defaultdict(lambda: [0.0, 0, 0.0, 0.0])  # us, count, flops, bytes
    for e in events:
        a = e.get("args", {})
        k = a.get(key) or e.get("name", "?")
        if key == "name":
            k = e.get("name", "?")
        rec = agg[k]
        rec[0] += e.get("dur", 0)
        rec[1] += 1
        try:
            rec[2] += float(a.get("model_flops", 0) or 0)
        except (TypeError, ValueError):
            pass
        try:
            rec[3] += float(a.get("raw_bytes_accessed", 0) or 0)
        except (TypeError, ValueError):
            pass
    return agg


def report(root, top_n=25, divisor=1.0):
    evs = device_events(root)
    total = sum(e.get("dur", 0) for e in evs)
    print(f"device total: {total/1e3/divisor:.2f} ms "
          f"({len(evs)} events, /{divisor:g})")
    for key in ("hlo_category", "name"):
        agg = aggregate(evs, key)
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
        print(f"-- by {key} --")
        for k, (us, cnt, fl, by) in rows:
            ms = us / 1e3 / divisor
            rate = ""
            if fl and us:
                rate += f" {fl/us/1e6:7.1f} TF/s"
            if by and us:
                rate += f" {by/us*1e6/1e9:7.0f} GB/s"
            print(f"  {ms:9.3f} ms  x{cnt:<5d} {k[:90]}{rate}")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jxtrace"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    div = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    report(root, top, div)
