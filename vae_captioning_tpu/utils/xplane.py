"""Dependency-free reader for ``jax.profiler`` XPlane traces.

``Config.profile`` (train.py) and ``jax.profiler.trace`` write
``*.xplane.pb`` protobufs.  The usual readers (TensorBoard profile
plugin / xprof) are not available in a lean TPU image, so this module
decodes the protobuf wire format directly — just enough schema for the
question that matters during kernel work: *which ops ate the device
time*.  It found both round-2 decode bottlenecks (XLA's serialized
small-int gathers and the beam loop's layout-change copies; PERF.md).

Schema subset (tensorflow/profiler xplane.proto):
  XSpace.planes = 1           XPlane.name = 2
  XPlane.lines = 3            XPlane.event_metadata = 4 (map<int64, ..>)
  XLine.name = 2              XLine.events = 4
  XEvent.metadata_id = 1      XEvent.duration_ps = 3
  XEventMetadata.name = 2

CLI:
  python -m vae_captioning_tpu.utils.xplane <trace_dir|file.xplane.pb> \
      [--top N] [--plane SUBSTR]
"""

from __future__ import annotations

import collections
import glob
import os
from typing import Dict, Iterator, List, Tuple


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    x = 0
    s = 0
    n = len(buf)
    while True:
        if i >= n:
            raise ValueError("truncated protobuf (varint runs past buffer)")
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over one message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:                       # varint
            v, i = _read_varint(buf, i)
            yield fn, wt, v
        elif wt == 2:                     # length-delimited
            ln, i = _read_varint(buf, i)
            yield fn, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:                     # 32-bit
            yield fn, wt, buf[i:i + 4]
            i += 4
        elif wt == 1:                     # 64-bit
            yield fn, wt, buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


class OpStats(
        collections.namedtuple("OpStats", ["name", "duration_ps", "count"])):
    @property
    def duration_ms(self) -> float:
        return self.duration_ps / 1e9


def resolve_trace_path(path: str) -> str:
    """Accept a trace dir (as passed to jax.profiler.trace) or a file."""
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return hits[-1]      # newest capture


def aggregate(path: str) -> Dict[str, List[OpStats]]:
    """Per plane (device), events aggregated by op name, most-expensive
    first.  Durations are summed over occurrences; async ops that
    overlap compute are counted by their full span."""
    data = open(resolve_trace_path(path), "rb").read()
    out: Dict[str, List[OpStats]] = {}
    for fn, _, plane in _fields(data):
        if fn != 1:
            continue
        pname = ""
        lines = []
        meta: Dict[int, str] = {}
        for f2, _, v2 in _fields(plane):
            if f2 == 2:
                pname = v2.decode("utf-8", "replace")
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:                 # map entry {1: key, 2: value}
                key = None
                msg = None
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        key = v3
                    elif f3 == 2:
                        msg = v3
                if msg is not None:
                    name = ""
                    for f4, _, v4 in _fields(msg):
                        if f4 == 2:
                            name = v4.decode("utf-8", "replace")
                    meta[key] = name
        if not lines:
            continue
        dur = collections.Counter()
        cnt = collections.Counter()
        for line in lines:
            for f3, _, v3 in _fields(line):
                if f3 != 4:
                    continue
                mid = None
                d = 0
                for f4, _, v4 in _fields(v3):
                    if f4 == 1:
                        mid = v4
                    elif f4 == 3:
                        d = v4
                nm = meta.get(mid, str(mid))
                dur[nm] += d
                cnt[nm] += 1
        out[pname] = [OpStats(nm, d, cnt[nm]) for nm, d in dur.most_common()]
    return out


def format_report(stats: Dict[str, List[OpStats]], top: int = 20,
                  plane_filter: str = "") -> str:
    rows = []
    for pname, ops in stats.items():
        if plane_filter and plane_filter not in pname:
            continue
        total = sum(o.duration_ps for o in ops)
        rows.append(f"== {pname}: {len(ops)} distinct ops, "
                    f"Σ {total / 1e9:.2f} ms (async spans overlap)")
        for o in ops[:top]:
            rows.append(f"  {o.duration_ms:10.3f} ms  x{o.count:<6d} "
                        f"{o.name[:110]}")
    return "\n".join(rows)


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Summarize a jax.profiler xplane trace by op cost")
    p.add_argument("trace", help="trace dir (jax.profiler.trace target) "
                                 "or one *.xplane.pb file")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--plane", default="",
                   help="only planes whose name contains this substring "
                        "(e.g. TPU)")
    args = p.parse_args(argv)
    try:
        report = format_report(aggregate(args.trace), args.top, args.plane)
    except ValueError as e:
        raise SystemExit(f"xplane: cannot decode {args.trace!r}: {e}")
    print(report)


if __name__ == "__main__":
    main()
