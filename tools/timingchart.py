#!/usr/bin/env python3
"""Render a pipeline busy/idle timeline CSV as an SVG Gantt chart.

The reference ships extras/timingchart.rb, a Ruby/Tk viewer for the
unithread.h LogDump CSV (name,start,stop per busy span). This is the
headless analog: same input format (thrplay -t trace.csv), output is a
self-contained SVG with one lane per pipeline stage, busy spans filled,
idle gaps left blank.

Usage: python tools/timingchart.py trace.csv [-o chart.svg]
"""

from __future__ import annotations

import argparse
import html
import pathlib
import sys

_COLORS = ["#4878d0", "#ee854a", "#6acc64", "#d65f5f", "#956cb4",
           "#8c613c", "#dc7ec0", "#797979"]


def parse_csv(text):
    """-> {lane_name: [(start, stop), ...]} (input units preserved)."""
    lanes: dict[str, list] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        name, a, b = line.rsplit(",", 2)
        lanes.setdefault(name, []).append((float(a), float(b)))
    return lanes


def render_svg(lanes, width=1200, lane_h=28, pad=4, label_w=140):
    if not lanes:
        return "<svg xmlns='http://www.w3.org/2000/svg'/>"
    t0 = min(a for spans in lanes.values() for a, _ in spans)
    t1 = max(b for spans in lanes.values() for _, b in spans)
    span = max(t1 - t0, 1e-9)
    plot_w = width - label_w - pad
    height = (lane_h + pad) * len(lanes) + 40

    def sx(t):
        return label_w + plot_w * (t - t0) / span

    out = [
        f"<svg xmlns='http://www.w3.org/2000/svg' width='{width}' "
        f"height='{height}' font-family='monospace' font-size='12'>",
        f"<rect width='{width}' height='{height}' fill='white'/>",
    ]
    for li, (name, spans) in enumerate(sorted(lanes.items())):
        y = 20 + li * (lane_h + pad)
        color = _COLORS[li % len(_COLORS)]
        busy = sum(b - a for a, b in spans)
        out.append(
            f"<text x='4' y='{y + lane_h * 0.7:.1f}'>"
            f"{html.escape(name)} ({100 * busy / span:.0f}%)</text>")
        out.append(
            f"<rect x='{label_w}' y='{y}' width='{plot_w}' "
            f"height='{lane_h}' fill='#f2f2f2'/>")
        for a, b in spans:
            w = max(sx(b) - sx(a), 0.5)
            out.append(
                f"<rect x='{sx(a):.2f}' y='{y}' width='{w:.2f}' "
                f"height='{lane_h}' fill='{color}'>"
                f"<title>{html.escape(name)}: {a:.6g}..{b:.6g} "
                f"({b - a:.6g})</title></rect>")
    # time axis
    y_ax = height - 16
    out.append(f"<line x1='{label_w}' y1='{y_ax}' x2='{width - pad}' "
               f"y2='{y_ax}' stroke='black'/>")
    for k in range(11):
        t = t0 + span * k / 10
        out.append(f"<text x='{sx(t):.1f}' y='{height - 2}' "
                   f"text-anchor='middle'>{t - t0:.3g}</text>")
    out.append("</svg>")
    return "\n".join(out)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("-o", dest="out", default=None)
    args = ap.parse_args(argv)
    text = pathlib.Path(args.csv).read_text()
    svg = render_svg(parse_csv(text))
    out = args.out or str(pathlib.Path(args.csv).with_suffix(".svg"))
    pathlib.Path(out).write_text(svg)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
