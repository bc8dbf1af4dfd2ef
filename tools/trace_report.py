"""Summarize a JAX/TensorBoard profiler trace (xplane.pb) per op.

Usage:
    BENCH_PROFILE=/tmp/trace python bench.py       # writes the trace
    python tools/trace_report.py /tmp/trace [--top 40]

Parses the XLA op events on the TPU device plane and aggregates
duration by op name / category, so PERF.md's step breakdown comes from
the device timeline instead of difference-quotient arithmetic
(VERDICT r2 item 2).  Requires tensorflow (for the xplane protobuf).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def find_xplanes(root: str):
    pats = [os.path.join(root, "**", "*.xplane.pb")]
    files: list = []
    for p in pats:
        files += glob.glob(p, recursive=True)
    return sorted(files)


def categorize(name: str) -> str:
    """Coarse buckets for the serving-step ops."""
    n = name.lower()
    if "conv" in n:
        return "conv"
    if n.startswith("custom-call") or "pallas" in n or "attend" in n \
            or "kernel" in n:
        return "attend-kernel"
    if "fusion" in n:
        return "fusion (elementwise/LN/softmax/glue)"
    if "dot" in n or "matmul" in n or "einsum" in n:
        return "matmul"
    if "copy" in n or "transpose" in n or "bitcast" in n \
            or "reshape" in n:
        return "layout/copy"
    if "dynamic-update" in n or "scatter" in n:
        return "cache-write"
    if "dynamic-slice" in n or "gather" in n:
        return "slice/gather"
    if "while" in n or "condition" in n or "body" in n:
        return "control"
    return "other"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args(argv)

    xplane_pb2 = None
    for mod in ("tensorflow.core.profiler.protobuf.xplane_pb2",
                "tensorflow.python.profiler.protobuf.xplane_pb2",
                "tensorflow.tsl.profiler.protobuf.xplane_pb2"):
        try:
            import importlib
            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        raise SystemExit("needs tensorflow's xplane_pb2 (none importable)")

    files = find_xplanes(args.trace_dir)
    if not files:
        raise SystemExit(f"no *.xplane.pb under {args.trace_dir}")

    for path in files:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            by_name: dict = collections.Counter()
            counts: dict = collections.Counter()
            span_min, span_max = None, None
            for line in plane.lines:
                # XLA op lines carry per-op events; skip derived
                # step/annotation lines to avoid double counting
                lname = line.name.lower()
                if "step" in lname or "annotation" in lname:
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, "?")
                    by_name[name] += ev.duration_ps
                    counts[name] += 1
                    t0 = ev.offset_ps
                    t1 = ev.offset_ps + ev.duration_ps
                    span_min = t0 if span_min is None else min(span_min, t0)
                    span_max = t1 if span_max is None else max(span_max, t1)
            if not by_name:
                continue
            total = sum(by_name.values())
            span = (span_max - span_min) if span_min is not None else 0
            print(f"\n=== {os.path.basename(path)} :: {plane.name} ===")
            print(f"busy {total/1e9:.3f} ms across {sum(counts.values())} "
                  f"events; wall span {span/1e9:.3f} ms "
                  f"(idle {max(span-total,0)/1e9:.3f} ms)")
            by_cat: dict = collections.Counter()
            for name, ps in by_name.items():
                by_cat[categorize(name)] += ps
            print("\n-- by category --")
            for cat, ps in by_cat.most_common():
                print(f"{ps/1e9:10.3f} ms  {100*ps/total:5.1f}%  {cat}")
            print(f"\n-- top {args.top} ops --")
            for name, ps in by_name.most_common(args.top):
                print(f"{ps/1e9:10.3f} ms  x{counts[name]:<5d} {name[:90]}")


if __name__ == "__main__":
    main()
