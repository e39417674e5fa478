"""Parse a jax.profiler xplane.pb (XSpace) and print device-op hotspots.

TensorBoard isn't installable here, so this is a minimal protobuf
wire-format reader for the XSpace schema (tensorflow/tsl
profiler/protobuf/xplane.proto) — enough to aggregate XLA op / fusion
device time from the '/device:TPU:*' planes:

    python tools/xplane.py /tmp/lb_trace/plugins/profile/<ts>/<host>.xplane.pb
    python tools/xplane.py <dir-or-pb> --lines "XLA Ops" --top 30

Schema subset (field numbers from xplane.proto):
    XSpace:   planes=1
    XPlane:   name=2, lines=3, event_metadata=4 (map<int64,XEventMetadata>),
              stat_metadata=5 (map<int64,XStatMetadata>)
    XLine:    name=2, events=4, display_name=11
    XEvent:   metadata_id=1, offset_ps=2, duration_ps=3, stats=4
    XEventMetadata: id=1, name=2, display_name=4
"""
import argparse
import glob
import os
import sys


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        out |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return out, i
        shift += 7


def fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's wire data."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:          # varint
            val, i = _varint(buf, i)
        elif wt == 1:        # fixed64
            val, i = buf[i:i + 8], i + 8
        elif wt == 2:        # length-delimited
            ln, i = _varint(buf, i)
            val, i = buf[i:i + ln], i + ln
        elif wt == 5:        # fixed32
            val, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, val


def parse_event_metadata(buf: bytes) -> tuple[int, str]:
    mid, name, display = 0, "", ""
    for fno, _, val in fields(buf):
        if fno == 1:
            mid = val
        elif fno == 2:
            name = val.decode("utf-8", "replace")
        elif fno == 4:
            display = val.decode("utf-8", "replace")
    return mid, display or name


def parse_plane(buf: bytes):
    """-> (plane_name, {line_name: [(event_name, duration_ps), ...]})"""
    name = ""
    meta: dict[int, str] = {}
    raw_lines = []
    for fno, _, val in fields(buf):
        if fno == 2:
            name = val.decode("utf-8", "replace")
        elif fno == 3:
            raw_lines.append(val)
        elif fno == 4:  # map entry: key=1 varint, value=2 XEventMetadata
            for f2, _, v2 in fields(val):
                if f2 == 2:
                    mid, mname = parse_event_metadata(v2)
                    meta[mid] = mname
    lines = {}
    for lb in raw_lines:
        lname = ""
        events = []
        for fno, _, val in fields(lb):
            if fno == 2:
                lname = val.decode("utf-8", "replace")
            elif fno == 11 and not lname:
                lname = val.decode("utf-8", "replace")
            elif fno == 4:
                mid = dur = 0
                for f2, _, v2 in fields(val):
                    if f2 == 1:
                        mid = v2
                    elif f2 == 3:
                        dur = v2
                events.append((meta.get(mid, f"#{mid}"), dur))
        lines.setdefault(lname, []).extend(events)
    return name, lines


def parse_xspace(fp: str):
    """-> {plane_name: {line_name: [(event_name, duration_ps), ...]}}"""
    buf = open(fp, "rb").read()
    planes = {}
    for fno, _, val in fields(buf):
        if fno == 1:
            name, lines = parse_plane(val)
            if name in planes:  # merge duplicate plane names
                for ln, evs in lines.items():
                    planes[name].setdefault(ln, []).extend(evs)
            else:
                planes[name] = lines
    return planes


def find_pb(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise SystemExit(f"no .xplane.pb under {path}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help=".xplane.pb file or a trace dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--plane", default="TPU", help="substring of plane name (default TPU)")
    ap.add_argument("--lines", default=None, help="substring filter on line name (e.g. 'XLA Ops')")
    args = ap.parse_args()

    fp = find_pb(args.path)
    planes = parse_xspace(fp)
    print(f"# {fp}")
    for pname, lines in planes.items():
        if args.plane not in pname:
            continue
        for lname, evs in lines.items():
            if args.lines and args.lines not in lname:
                continue
            if not evs:
                continue
            agg: dict[str, list[float]] = {}
            for name, dur in evs:
                a = agg.setdefault(name, [0.0, 0])
                a[0] += dur
                a[1] += 1
            total = sum(a[0] for a in agg.values())
            print(f"\n== plane '{pname}' line '{lname}' — {total/1e9:.3f} ms device time, "
                  f"{len(evs)} events")
            for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]:
                print(f"{dur/1e9:9.3f} ms {100*dur/max(total,1):5.1f}%  x{cnt:<5d} {name[:95]}")


if __name__ == "__main__":
    main()
