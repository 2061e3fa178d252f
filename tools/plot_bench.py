"""Bench plot post-processing — the reference's plotting pipeline
re-expressed without its matplotlib dependency.

The reference renders its bench CSVs as grouped per-filter bar charts
with a BROKEN y-axis (``/root/reference/scripts/arg-plotter.py`` +
the brokenaxes package): builds and lookups share one figure, and the
axis break keeps one slow outlier filter from flattening every other
bar. This image has no matplotlib, so the same artifacts are rendered
as self-contained SVG with the standard library only:

- ``filters_build.svg`` / ``filters_probe.svg``: grouped bars over the
  sketch build/probe rows of ``BENCH/last_run.json`` (medians — the
  reference's Generate-median-csv.py role is already inside bench.py).
- ``pipeline_rows.svg``: every pipeline row, sorted, one bar each.

Broken axis rule (brokenaxes' role, re-derived): when the max value
exceeds ``BREAK_FACTOR`` x the 90th percentile of the rest, the y
scale splits into a lower segment covering the pack and an upper
segment covering the outliers, joined with the classic zig-zag break
marks; bars spanning the gap are drawn through it.

Usage: ``python tools/plot_bench.py [BENCH/last_run.json] [outdir]``.
"""

from __future__ import annotations

import json
import os
import sys

BREAK_FACTOR = 3.0

# palette: colorblind-safe Okabe-Ito subset
_COLORS = ["#0072B2", "#E69F00", "#009E73", "#CC79A7", "#56B4E9", "#D55E00"]


def broken_axis_segments(values: list[float]) -> list[tuple[float, float]]:
    """[(lo, hi)] y-segments bottom-up: one segment normally; two when
    the max dwarfs the pack (reference brokenaxes behavior)."""
    vs = sorted(v for v in values if v > 0)
    if not vs:
        return [(0.0, 1.0)]
    top = vs[-1]
    rest = vs[:-1] or vs
    p90 = rest[min(len(rest) - 1, int(0.9 * len(rest)))]
    if len(vs) >= 3 and p90 > 0 and top > BREAK_FACTOR * p90:
        # pack segment + outlier segment
        pack_hi = p90 * 1.25
        out_lo = min(v for v in vs if v > BREAK_FACTOR * p90) * 0.85
        return [(0.0, pack_hi), (out_lo, top * 1.08)]
    return [(0.0, top * 1.1)]


def _fmt(v: float) -> str:
    if v >= 100:
        return f"{v:.0f}"
    if v >= 1:
        return f"{v:.2f}".rstrip("0").rstrip(".")
    return f"{v:.3f}".rstrip("0").rstrip(".")


def render_grouped_bars(
    groups: dict[str, dict[str, float]],
    title: str,
    unit: str = "sec",
    width: int = 960,
    height: int = 420,
) -> str:
    """groups: {group_label: {series_label: value}} -> SVG text.

    Bars grouped per group_label, one color per series, legend, value
    labels, broken y axis per ``broken_axis_segments``."""
    series = sorted({s for g in groups.values() for s in g})
    labels = list(groups)
    values = [v for g in groups.values() for v in g.values()]
    segs = broken_axis_segments(values)
    ml, mr, mt, mb = 64, 16, 44, 72
    plot_w, plot_h = width - ml - mr, height - mt - mb
    gap_px = 14 if len(segs) > 1 else 0
    usable = plot_h - gap_px * (len(segs) - 1)
    if len(segs) > 1:
        seg_px = [usable * 0.62, usable * 0.38]  # pack gets most room
    else:
        seg_px = [usable]

    def Y(v):
        # pixel y (SVG coords, top-left origin) of value v across the
        # stacked segments, inserting gap_px of dead space at each break
        acc = 0.0
        for i, ((lo, hi), px) in enumerate(zip(segs, seg_px)):
            if v <= hi or i == len(segs) - 1:
                pos = acc + max(0.0, min(v - lo, hi - lo)) / (hi - lo) * px
                return mt + plot_h - pos
            acc += px + gap_px
        return mt + plot_h

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'font-family="Helvetica,Arial,sans-serif" font-size="12">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width/2:.0f}" y="24" text-anchor="middle" font-size="16" '
        f'font-weight="bold">{title}</text>',
    ]
    # y grid + labels per segment
    for (lo, hi), px in zip(segs, seg_px):
        for k in range(4):
            v = lo + (hi - lo) * k / 3
            y = Y(v if v > lo else lo + 1e-12)
            out.append(
                f'<line x1="{ml}" y1="{y:.1f}" x2="{width-mr}" y2="{y:.1f}" '
                f'stroke="#ddd" stroke-width="1"/>'
            )
            out.append(
                f'<text x="{ml-6}" y="{y+4:.1f}" text-anchor="end" '
                f'fill="#444">{_fmt(v)}</text>'
            )
    # break marks
    if len(segs) > 1:
        ybreak = Y(segs[0][1]) - gap_px / 2
        for x in (ml, width - mr):
            out.append(
                f'<path d="M {x-6} {ybreak+4} l 12 -8 m -12 2 l 12 -8" '
                f'stroke="#444" fill="none" stroke-width="1.5"/>'
            )
    # bars
    n_g, n_s = len(labels), max(1, len(series))
    group_w = plot_w / max(1, n_g)
    bar_w = min(34.0, group_w * 0.8 / n_s)
    for gi, glabel in enumerate(labels):
        gx = ml + gi * group_w + group_w / 2
        for si, slabel in enumerate(series):
            v = groups[glabel].get(slabel)
            if v is None:
                continue
            x = gx + (si - n_s / 2) * bar_w
            y = Y(v)
            y0 = Y(1e-12)
            color = _COLORS[si % len(_COLORS)]
            out.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{bar_w-2:.1f}" '
                f'height="{max(0.5, y0-y):.1f}" fill="{color}"/>'
            )
            out.append(
                f'<text x="{x+(bar_w-2)/2:.1f}" y="{y-4:.1f}" text-anchor="middle" '
                f'fill="#222" font-size="10">{_fmt(v)}</text>'
            )
        out.append(
            f'<text x="{gx:.1f}" y="{mt+plot_h+16}" text-anchor="middle" '
            f'transform="rotate(25 {gx:.1f} {mt+plot_h+16})" fill="#222">{glabel}</text>'
        )
    # legend + unit
    lx = ml
    for si, slabel in enumerate(series):
        out.append(
            f'<rect x="{lx}" y="{height-18}" width="10" height="10" '
            f'fill="{_COLORS[si % len(_COLORS)]}"/>'
        )
        out.append(f'<text x="{lx+14}" y="{height-9}" fill="#222">{slabel}</text>')
        lx += 14 + 7 * len(slabel) + 18
    out.append(
        f'<text x="{width-mr}" y="{height-9}" text-anchor="end" fill="#666">{unit}</text>'
    )
    out.append("</svg>")
    return "\n".join(out)


_FILTER_PREFIXES = ("pf", "bloom", "bbf", "tc", "ck", "xor", "bfuse", "ribbon", "qf",
                    "hll", "cms", "kll", "tdigest", "dds")


def bench_figures(run: dict) -> dict[str, str]:
    """{figure_name: svg_text} from a bench result dict (last_run.json
    shape: needs ``queries``; uses medians, like the reference's
    median CSVs)."""
    q = run.get("queries", {})
    build = {}
    probe = {}
    pipeline = {}
    for name, v in q.items():
        head = name.split("_")[0]
        if head in _FILTER_PREFIXES and (
            name.endswith("_build") or "_probe_" in name
        ):
            if name.endswith("_build"):
                build.setdefault(head, {})["build"] = v
            else:
                kind = name.split("_probe_")[1]
                probe.setdefault(head, {})[f"probe_{kind}"] = v
        elif not name.startswith("trivial"):
            pipeline[name] = {"median": v}
    figs = {
        "filters_build": render_grouped_bars(
            build, "Sketch build time (median)", unit="sec"
        ),
        "filters_probe": render_grouped_bars(
            probe, "Probe time (median)", unit="sec"
        ),
    }
    if pipeline:
        ordered = dict(
            sorted(pipeline.items(), key=lambda kv: -kv[1]["median"])
        )
        figs["pipeline_rows"] = render_grouped_bars(
            ordered,
            "Pipeline query rows (median)",
            unit="sec",
            width=max(960, 26 * len(ordered) + 120),
        )
    return figs


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "last_run.json",
    )
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(src), "plots"
    )
    with open(src) as f:
        run = json.load(f)
    os.makedirs(outdir, exist_ok=True)
    for name, svg in bench_figures(run).items():
        path = os.path.join(outdir, f"{name}.svg")
        with open(path, "w") as f:
            f.write(svg)
        print(path)


if __name__ == "__main__":
    main()
