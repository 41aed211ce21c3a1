"""Summarize a JAX profiler trace (.xplane.pb) without TensorBoard.

The reference's profiling story is DeepSpeed FlopsProfiler + torch autograd
traces (`egs2/seame/asr1/pyscripts/utils/profile_encoder.py`,
`espnet2/train/trainer.py:37`); the TPU-native equivalent is the JAX
profiler's XSpace trace. TensorBoard's profile plugin can render it, but a
CLI summary is what perf work actually needs: per-op self time on the
device plane, grouped by op name / category, plus the copy/infeed lines.

The XSpace protobuf is parsed with a minimal wire-format reader (the
schema is tsl/profiler/protobuf/xplane.proto; only the fields used here
are decoded) so this tool needs no tensorflow/protoc at runtime.

Usage:
  python tools/xplane_summary.py <trace_dir_or_xplane.pb> [--top 30]
                                 [--plane substr] [--line substr]
                                 [--group-by name|category]

`trace_dir` may be the log_dir passed to agacs_tpu.utils.profiling.trace;
the newest plugins/profile/*/xx.xplane.pb underneath is used.

Times are SELF times: events on a line nest by interval (a `while` op
contains its body ops), so each event's children are subtracted before
aggregation — percentages sum to the line's busy time, not above it.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


# ---------------------------------------------------------------- wire format

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's fields.
    Length-delimited values are returned as memoryview slices."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, i = _read_varint(buf, i)
        elif wt == 1:
            val = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wt == 5:
            val = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:  # groups (3/4) don't occur in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# ---------------------------------------------------------------- xplane bits

class Event:
    __slots__ = ("metadata_id", "offset_ps", "duration_ps")

    def __init__(self):
        self.metadata_id = 0
        self.offset_ps = 0
        self.duration_ps = 0


def _parse_event(buf) -> Event:
    ev = Event()
    for f, _, v in _fields(buf):
        if f == 1:
            ev.metadata_id = v
        elif f == 2:
            ev.offset_ps = v
        elif f == 3:
            ev.duration_ps = v
    return ev


def _parse_line(buf) -> tuple[str, list[Event]]:
    name = ""
    events: list[Event] = []
    for f, _, v in _fields(buf):
        if f == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif f == 11 and not name:
            name = bytes(v).decode("utf-8", "replace")
        elif f == 4:
            events.append(_parse_event(v))
    return name, events


def _parse_event_metadata(buf) -> tuple[int, str]:
    mid, name, display = 0, "", ""
    for f, _, v in _fields(buf):
        if f == 1:
            mid = v
        elif f == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif f == 4:
            display = bytes(v).decode("utf-8", "replace")
    return mid, display or name


def _parse_map_entry(buf) -> tuple[int, bytes]:
    key, val = 0, b""
    for f, _, v in _fields(buf):
        if f == 1:
            key = v
        elif f == 2:
            val = v
    return key, val


class Plane:
    def __init__(self):
        self.name = ""
        self.lines: list[tuple[str, list[Event]]] = []
        self.event_names: dict[int, str] = {}


def _parse_plane(buf) -> Plane:
    pl = Plane()
    for f, _, v in _fields(buf):
        if f == 2:
            pl.name = bytes(v).decode("utf-8", "replace")
        elif f == 3:
            pl.lines.append(_parse_line(v))
        elif f == 4:
            _, mbuf = _parse_map_entry(v)
            mid, name = _parse_event_metadata(mbuf)
            pl.event_names[mid] = name
    return pl


def parse_xspace(path: str) -> list[Plane]:
    with open(path, "rb") as fh:
        data = fh.read()
    return [_parse_plane(v) for f, _, v in _fields(data) if f == 1]


# ---------------------------------------------------------------- summarizing

# HLO op name -> coarse category, in matching order
_CATEGORIES = [
    ("copy", re.compile(r"^copy|copy-start|copy-done|^dynamic-update-slice")),
    ("fusion:attention", re.compile(r"flash|attention|softmax", re.I)),
    ("convolution", re.compile(r"^convolution|^conv")),
    ("matmul", re.compile(r"^dot|^cublas|^custom-call.*matmul|fusion.*dot", re.I)),
    ("all-reduce", re.compile(r"^all-reduce|^reduce-scatter|^all-gather|^collective")),
    ("infeed/outfeed", re.compile(r"infeed|outfeed|host")),
    ("fusion", re.compile(r"^fusion|^loop_")),
    ("reduce", re.compile(r"^reduce")),
    ("scan/while", re.compile(r"^while")),
]


def categorize(name: str) -> str:
    base = name.split(".")[0]
    for cat, rx in _CATEGORIES:
        if rx.search(base) or rx.search(name):
            return cat
    return base or "other"


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        sys.exit(f"no .xplane.pb under {path}")
    return hits[-1]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace", help="trace dir or .xplane.pb file")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane", default="TPU", help="substring filter on plane name (default TPU; use '' for all)")
    ap.add_argument("--line", default="XLA Ops",
                    help="line name filter (default 'XLA Ops'; device planes "
                         "carry overlapping lines — XLA Modules/Steps span "
                         "the same wall clock, so summing every line "
                         "double-counts; pass '' to sum all lines anyway)")
    ap.add_argument("--group-by", choices=("name", "category"), default="name")
    ap.add_argument("--steps", type=int, default=0,
                    help="divide totals by N steps for per-step times")
    args = ap.parse_args(argv)

    path = find_xplane(args.trace)
    planes = parse_xspace(path)
    sel = [p for p in planes if args.plane.lower() in p.name.lower()]
    if not sel:
        print(f"planes in {path}:")
        for p in planes:
            print(f"  {p.name!r}: lines {[ln for ln, _ in p.lines]}")
        sys.exit(f"no plane matching {args.plane!r}")
    if args.line and not any(
        args.line.lower() in ln.lower() for p in sel for ln, _ in p.lines
    ):
        avail = sorted({ln for p in sel for ln, _ in p.lines})
        sys.exit(f"no line matching {args.line!r}; available: {avail}")

    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    plane_total = 0.0
    for p in sel:
        for line_name, events in p.lines:
            if args.line and args.line.lower() != line_name.lower() and (
                args.line.lower() not in line_name.lower()
                or any(
                    args.line.lower() == ln.lower() for ln, _ in p.lines
                )
            ):
                continue
            # self time: events on a line nest by interval (while contains
            # its body); subtract each child's span from its parent
            evs = sorted(events, key=lambda e: (e.offset_ps, -e.duration_ps))
            stack: list[tuple[int, int]] = []  # (end_ps, idx into selfs)
            selfs = [e.duration_ps for e in evs]
            for i, ev in enumerate(evs):
                start, end = ev.offset_ps, ev.offset_ps + ev.duration_ps
                while stack and stack[-1][0] <= start:
                    stack.pop()
                if stack:
                    selfs[stack[-1][1]] -= ev.duration_ps
                stack.append((end, i))
            for ev, self_ps in zip(evs, selfs):
                name = p.event_names.get(ev.metadata_id, f"#{ev.metadata_id}")
                key = name if args.group_by == "name" else categorize(name)
                dur_ms = max(self_ps, 0) / 1e9
                totals[key] += dur_ms
                counts[key] += 1
                plane_total += dur_ms

    div = max(args.steps, 1)
    unit = "ms/step" if args.steps else "ms total"
    print(f"# {path}")
    print(f"# planes: {[p.name for p in sel]}  lines filter: {args.line!r}")
    print(f"# events: {sum(counts.values())}   device busy: "
          f"{plane_total / div:.2f} {unit}")
    width = max((len(k) for k in totals), default=4)
    print(f"{'op':<{min(width, 70)}}  {unit:>10}  {'%':>5}  count")
    for key, ms in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]:
        pct = 100.0 * ms / plane_total if plane_total else 0.0
        print(f"{key[:70]:<{min(width, 70)}}  {ms / div:>10.3f}  {pct:>5.1f}  "
              f"{counts[key] / div:.0f}")


if __name__ == "__main__":
    main()
