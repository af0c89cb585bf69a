"""Parse a jax.profiler xplane.pb trace and print the top TPU ops.

Self-contained protobuf wire-format decoder (the tensorboard profile
plugin's generated protos are not importable in this environment). The
per-op table is the §5.1 observability story: run a render inside
`jax.profiler.trace(logdir)` and point this at the resulting
`*.xplane.pb`.

Usage: python benchmarks/profile_trace.py <trace.xplane.pb> [n_iters]
"""
from __future__ import annotations

import collections
import sys


def _varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _varint(buf, pos)
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_xplane(path: str):
    """-> {plane_name: Counter{op_name: duration_ps}}"""
    data = open(path, "rb").read()
    out = {}
    for fnum, _, plane_buf in _fields(data):
        if fnum != 1:
            continue
        name = ""
        metadata = {}
        lines = []
        for pf, _, pv in _fields(plane_buf):
            if pf == 2:
                name = pv.decode()
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                key = mname = None
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        key = mv
                    elif mf == 2:  # XEventMetadata
                        for ef, _, ev in _fields(mv):
                            if ef == 2:
                                mname = ev.decode()
                if key is not None:
                    metadata[key] = mname or ""
        counter = collections.Counter()
        for line_buf in lines:
            for lf, _, lv in _fields(line_buf):
                if lf != 4:  # XEvent (XLine.events = 4)
                    continue
                mid = dur = 0
                for ef, _, ev in _fields(lv):
                    if ef == 1:
                        mid = ev
                    elif ef == 3:
                        dur = ev
                counter[metadata.get(mid, f"op{mid}")] += dur
        if counter:
            out[name] = counter
    return out


def main():
    path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    planes = parse_xplane(path)
    for pname, ops in planes.items():
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        total = sum(ops.values())
        print(f"\n== {pname}: total {total/1e9/iters:.2f} ms/iter ==")
        for name, ps in ops.most_common(30):
            print(f"{ps/1e9/iters:9.3f} ms {100*ps/total:5.1f}%  {name[:100]}")


if __name__ == "__main__":
    main()
