"""Dump a time-ordered slice of a JAX profiler trace (.xplane.pb).

Complements tools/xplane_summary.py (aggregates): this prints the raw
sequential event stream around a named anchor op so stalls can be
attributed — a tiny op with a huge span is usually a sync-flag wait for
an in-flight DMA, and the surrounding events say which one.

Usage:
  python tools/xplane_timeline.py TRACE --anchor fusion.2854 \
      [--occurrence 2] [--before 8] [--after 8] [--lines '']
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xplane_summary import find_xplane, parse_xspace  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--anchor", required=True,
                    help="exact event name to center the window on")
    ap.add_argument("--occurrence", type=int, default=2,
                    help="which occurrence of the anchor (0-based; default 2 "
                         "skips the first warm-up steps)")
    ap.add_argument("--before", type=int, default=8)
    ap.add_argument("--after", type=int, default=8)
    ap.add_argument("--plane", default="TPU")
    ap.add_argument("--lines", default="",
                    help="line-name substring filter ('' = all lines)")
    ap.add_argument("--min-us", type=float, default=0.0,
                    help="drop events shorter than this from the dump")
    args = ap.parse_args(argv)

    path = find_xplane(args.trace)
    planes = [p for p in parse_xspace(path) if args.plane in p.name]
    if not planes:
        raise SystemExit(f"no plane matching {args.plane!r}")

    # Gather (start_ps, dur_ps, line, name) across the selected lines.
    events = []
    anchors = []
    for pl in planes:
        for lname, evs in pl.lines:
            if args.lines and args.lines not in lname:
                continue
            for ev in evs:
                name = pl.event_names.get(ev.metadata_id, f"#{ev.metadata_id}")
                rec = (ev.offset_ps, ev.duration_ps, lname, name)
                events.append(rec)
                if name == args.anchor:
                    anchors.append(rec)
    if not anchors:
        raise SystemExit(f"anchor {args.anchor!r} not found "
                         f"({len(events)} events scanned)")
    anchors.sort()
    idx = min(args.occurrence, len(anchors) - 1)
    a_start, a_dur, _, _ = anchors[idx]
    print(f"# anchor {args.anchor} occurrence {idx}/{len(anchors)} "
          f"start={a_start/1e6:.3f}us dur={a_dur/1e6:.3f}us")

    events.sort()
    # Window: N events before/after the anchor on each line, plus anything
    # overlapping the anchor span (async DMA etc.).
    lo = a_start - 1
    hi = a_start + a_dur + 1
    sel = []
    for rec in events:
        s, d, ln, nm = rec
        if s + d >= lo and s <= hi:
            sel.append(rec)
    # Pad with events just before/after the window on the anchor's line.
    before = [r for r in events if r[0] + r[1] < lo][-args.before:]
    after = [r for r in events if r[0] > hi][: args.after]
    out = sorted(set(before + sel + after))
    t0 = out[0][0] if out else 0
    for s, d, ln, nm in out:
        if d / 1e6 < args.min_us:
            continue
        mark = " <== ANCHOR" if (s == a_start and d == a_dur
                                 and nm == args.anchor) else ""
        print(f"{(s - t0)/1e6:12.3f}us  dur={d/1e6:10.3f}us  "
              f"[{ln}] {nm}{mark}")


if __name__ == "__main__":
    main()
