"""Minimal xplane.pb reader: per-HLO-op device time, no TF dependency.

Parses the protobuf wire format directly (XSpace/XPlane/XLine/XEvent)
and prints the top device ops by total duration. Used to find where
the fused decode program's device time goes.

Usage: python tools/xplane_ops.py /tmp/jxtrace/**/*.xplane.pb [topN]
"""

import glob
import sys
from collections import defaultdict


def _varint(b, i):
    x = 0
    s = 0
    while True:
        c = b[i]
        i += 1
        x |= (c & 0x7F) << s
        if not c & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:
            v, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(pbuf):
    name = b""
    lines = []
    emeta = {}
    for fno, wt, v in fields(pbuf):
        if fno == 2 and wt == 2:
            name = v
        elif fno == 3 and wt == 2:
            lines.append(v)
        elif fno == 4 and wt == 2:
            # map entry {int64 key=1; XEventMetadata value=2}
            k = None
            mv = None
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    mv = v2
            if mv is not None:
                mname = b""
                for f3, w3, v3 in fields(mv):
                    if f3 == 2 and w3 == 2:
                        mname = v3
                emeta[k] = mname.decode(errors="replace")
    return name.decode(errors="replace"), lines, emeta


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/jxtrace/**/*.xplane.pb"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    path = sorted(glob.glob(pat, recursive=True))[-1]
    buf = open(path, "rb").read()
    for fno, wt, pbuf in fields(buf):
        if fno != 1 or wt != 2:
            continue
        pname, lines, emeta = parse_plane(pbuf)
        if "TPU" not in pname and "tpu" not in pname:
            continue
        tot = defaultdict(int)
        cnt = defaultdict(int)
        for lbuf in lines:
            lname = b""
            events = []
            for f2, w2, v2 in fields(lbuf):
                if f2 == 2 and w2 == 2:
                    lname = v2
                elif f2 == 4 and w2 == 2:
                    events.append(v2)
            if b"XLA Ops" not in lname and b"Steps" not in lname \
                    and b"XLA Modules" not in lname:
                continue
            for ebuf in events:
                mid = dur = 0
                occ = 1
                for f3, w3, v3 in fields(ebuf):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 3:
                        dur = v3
                    elif f3 == 5:
                        occ = v3
                key = (lname.decode(errors="replace"),
                       emeta.get(mid, str(mid)))
                tot[key] += dur
                cnt[key] += 1
        print(f"== plane {pname}")
        for (ln, op), d in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {d / 1e9:9.3f} ms  x{cnt[(ln, op)]:<5d} [{ln}] {op}")


if __name__ == "__main__":
    main()
