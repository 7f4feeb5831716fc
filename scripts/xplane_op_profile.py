#!/usr/bin/env python
"""Op-level device-time profile from a jax.profiler trace (xplane.pb).

The tensorboard profile plugin's native converter is unusable in this image
(its `_pywrap_profiler.xspace_to_tools_data` symbol is missing), so this
parses the XSpace protobuf with a ~60-line wire-format decoder instead —
the XPlane schema (tsl/profiler/protobuf/xplane.proto) is stable:

    XSpace   { repeated XPlane planes = 1; }
    XPlane   { id=1; name=2; repeated XLine lines=3;
               map<int64,XEventMetadata> event_metadata=4; ... }
    XLine    { id=1; name=2; timestamp_ns=3; repeated XEvent events=4; }
    XEvent   { metadata_id=1; offset_ps=2; duration_ps=3; ... }
    XEventMetadata { id=1; name=2; ... }

Aggregates total duration per op name over the TPU device planes (planes
whose name contains "TPU" / "/device:"), prints a sorted table plus the
device-busy span (max event end - min event start per line, summed over
the busiest line).  Used for BENCH_NOTES op-profiles (rounds 3-4).

Usage: python scripts/xplane_op_profile.py /tmp/b1_trace [--top 40]
"""

import argparse
import collections
import glob
import os
import struct
import sys


def _varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:
            val = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, val


def parse_plane(buf):
    name = b""
    lines = []
    meta = {}
    for fno, wt, val in fields(buf):
        if fno == 2 and wt == 2:
            name = val
        elif fno == 3 and wt == 2:
            lines.append(val)
        elif fno == 4 and wt == 2:  # map entry {key=1, value=XEventMetadata}
            mid, mname = None, b""
            for f2, w2, v2 in fields(val):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 2 and w3 == 2:
                            mname = v3
            if mid is not None:
                meta[mid] = mname.decode("utf-8", "replace")
    return name.decode("utf-8", "replace"), lines, meta


def parse_line(buf):
    name = b""
    events = []
    for fno, wt, val in fields(buf):
        if fno == 2 and wt == 2:
            name = val
        elif fno == 4 and wt == 2:
            mid = off = dur = 0
            for f2, w2, v2 in fields(val):
                if w2 != 0:
                    continue
                if f2 == 1:
                    mid = v2
                elif f2 == 2:
                    off = v2
                elif f2 == 3:
                    dur = v2
            events.append((mid, off, dur))
    return name.decode("utf-8", "replace"), events


def profile(trace_dir, top=40, line_filter=None):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        sys.exit(f"no *.xplane.pb under {trace_dir}")
    buf = open(paths[-1], "rb").read()
    per_op = collections.Counter()
    per_line = {}
    for fno, wt, val in fields(buf):
        if fno != 1 or wt != 2:
            continue
        pname, lines, meta = parse_plane(val)
        if "TPU" not in pname and "/device:" not in pname:
            continue
        for lb in lines:
            lname, events = parse_line(lb)
            if line_filter and line_filter not in lname:
                continue
            if not events:
                continue
            span_lo = min(o for _, o, _ in events)
            span_hi = max(o + d for _, o, d in events)
            busy = sum(d for _, _, d in events)
            key = f"{pname} :: {lname}"
            acc = per_line.setdefault(key, [0, 0, 0])
            acc[0] += busy
            acc[1] = max(acc[1], span_hi - span_lo)
            acc[2] += len(events)
            for mid, _, dur in events:
                per_op[meta.get(mid, f"id{mid}")] += dur
    total = sum(per_op.values())
    print(f"== device lines (busy ps / span ps / events) ==")
    for k, (busy, span, n) in sorted(per_line.items()):
        print(f"{k:60s} busy {busy/1e9:9.3f} ms  span {span/1e9:9.3f} ms  {n} events")
    print(f"\n== per-op totals (sum {total/1e9:.3f} ms) ==")
    for name, dur in per_op.most_common(top):
        print(f"{dur/1e9:9.4f} ms  {100.0*dur/max(total,1):5.1f}%  {name}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line", default=None, help="substring filter on line name")
    args = ap.parse_args()
    profile(args.trace_dir, args.top, args.line)
