"""SVG bench-plot post-processing (tools/plot_bench.py) — the
reference's arg-plotter.py role (grouped bars, broken y-axis) without
matplotlib. Pure-python, no Spark."""

import json
import subprocess
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import plot_bench  # noqa: E402

NS = "{http://www.w3.org/2000/svg}"


def test_broken_axis_triggers_on_outlier():
    segs = plot_bench.broken_axis_segments([1.0, 1.2, 0.9, 1.1, 20.0])
    assert len(segs) == 2
    (lo0, hi0), (lo1, hi1) = segs
    assert lo0 == 0.0 and hi0 < 2.0  # pack segment tight around the pack
    assert lo1 > hi0 and hi1 >= 20.0  # outlier segment covers the max


def test_broken_axis_single_segment_for_flat_data():
    segs = plot_bench.broken_axis_segments([1.0, 1.2, 0.9, 1.4])
    assert len(segs) == 1 and segs[0][0] == 0.0 and segs[0][1] >= 1.4


def test_render_well_formed_svg_with_expected_bars():
    groups = {
        "pf": {"build": 1.4, "probe": 0.5},
        "bloom": {"build": 1.6, "probe": 0.4},
        "qf": {"build": 1.1},
    }
    svg = plot_bench.render_grouped_bars(groups, "t", "sec")
    root = ET.fromstring(svg)
    rects = root.findall(f".//{NS}rect")
    # background + 5 bars + 2 legend swatches
    assert len(rects) == 1 + 5 + 2
    texts = [t.text for t in root.findall(f".//{NS}text")]
    assert "pf" in texts and "bloom" in texts and "qf" in texts


def test_break_marks_present_for_skewed_chart():
    groups = {f"g{i}": {"v": 1.0 + i / 10} for i in range(6)}
    groups["slow"] = {"v": 30.0}
    svg = plot_bench.render_grouped_bars(groups, "t")
    root = ET.fromstring(svg)
    assert len(root.findall(f".//{NS}path")) == 2  # zig-zag pair


def test_main_writes_figures(tmp_path):
    run = {
        "queries": {
            "pf_build": 1.4,
            "pf_probe_uniform": 0.5,
            "bloom_build": 1.6,
            "hll_build": 0.6,
            "trivial_probe_uniform": 0.3,
            "minhash_lsh_dedup": 2.2,
            "tpch_q1": 0.4,
        }
    }
    src = tmp_path / "last_run.json"
    src.write_text(json.dumps(run))
    out = subprocess.run(
        [sys.executable, str(Path(plot_bench.__file__)), str(src), str(tmp_path / "plots")],
        capture_output=True,
        text=True,
        check=True,
    )
    written = sorted(p.name for p in (tmp_path / "plots").glob("*.svg"))
    assert written == ["filters_build.svg", "filters_probe.svg", "pipeline_rows.svg"]
    for p in (tmp_path / "plots").glob("*.svg"):
        ET.parse(p)  # well-formed
    # trivial control row excluded from the pipeline figure
    assert "trivial" not in (tmp_path / "plots" / "pipeline_rows.svg").read_text()
