"""A5 report sink: distributed downsample + dependency-free SVG render.

The downsample half is oracle-checked (`a_plot_downsample`); these tests
pin the renderer (deterministic, structurally correct SVG) and the
end-to-end sink on real testdata.
"""

from __future__ import annotations

from conftest import SF_SMOKE

from sparkwrangle.io import load_table
from sparkwrangle.jobs.report import (
    downsample_series,
    line_chart_svg,
    write_report_svg,
)


def test_downsample_bounded_and_exact(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    n_series = ev.select("event_type").distinct().count()
    out = downsample_series(ev, "ts", "value", "event_type", max_points=32)
    rows = out.collect()
    assert 0 < len(rows) <= n_series * 32
    buckets = {r["bucket"] for r in rows}
    assert all(0 <= b < 32 for b in buckets)
    # per-bucket invariants: band contains the mean, counts partition input
    for r in rows:
        assert r["y_min"] <= r["y_avg"] <= r["y_max"]
    total = sum(r["n"] for r in rows)
    assert total == ev.filter("ts is not null and value is not null").count()
    # x offsets are monotone in bucket within a series
    by_series: dict = {}
    for r in rows:
        by_series.setdefault(r["series"], []).append((r["bucket"], r["x_off"]))
    for pts in by_series.values():
        pts.sort()
        offs = [o for _, o in pts]
        assert offs == sorted(offs)


def test_svg_renderer_deterministic_structure():
    rows = [
        ("b", 0, 1.0),
        ("a", 0, 2.0),
        ("a", 10, 3.5),
        ("b", 10, -1.0),
        ("a", 20, 2.5),
    ]
    svg1 = line_chart_svg(rows, title="t", x_label="xs", y_label="ys")
    svg2 = line_chart_svg(list(reversed(rows)), title="t", x_label="xs", y_label="ys")
    # byte-deterministic regardless of input row order
    assert svg1 == svg2
    assert svg1.startswith("<svg ") and svg1.endswith("</svg>")
    assert svg1.count("<polyline") == 2  # one per series
    # series sorted: first polyline is 'a' (3 points), colors from palette
    pa, pb = svg1.split("<polyline")[1:]
    assert "<title>a</title>" in pa and pa.count(",") == 3
    assert "<title>b</title>" in pb and pb.count(",") == 2
    assert "#1f77b4" in pa and "#d62728" in pb
    # axes, ticks and labels are present
    assert svg1.count("<line ") == 2
    assert ">xs<" in svg1 and ">ys<" in svg1 and ">t<" in svg1


def test_svg_empty_input():
    svg = line_chart_svg([])
    assert svg.startswith("<svg ") and svg.endswith("</svg>")
    assert "<polyline" not in svg


def test_write_report_svg_end_to_end(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "report.svg")
    svg = write_report_svg(
        ev, path, "ts", "value", "event_type", max_points=16, title="events"
    )
    with open(path) as f:
        assert f.read() == svg
    n_series = ev.select("event_type").distinct().count()
    assert svg.count("<polyline") == n_series
    # a flat-line degenerate frame still renders (single x bucket)
    one = ev.limit(1)
    svg1 = write_report_svg(one, str(tmp_path / "one.svg"), "ts", "value")
    assert svg1.count("<polyline") == 1


def test_downsample_date_xcol_and_bad_type(spark):
    """DateType x plots as epoch days (Spark forbids date->bigint casts,
    so the old path raised at plan time); a string x raises a clear
    ValueError instead of silently null-casting every row away."""
    import datetime

    import pytest as _pytest

    from sparkwrangle.jobs.report import downsample_series

    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=i), float(i))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "d date, v double")
    out = downsample_series(df, "d", "v", max_points=5).collect()
    assert 1 <= len(out) <= 5
    assert sum(r.n for r in out) == 10
    sdf = spark.createDataFrame([("a", 1.0)], "s string, v double")
    with _pytest.raises(ValueError, match="unplottable"):
        downsample_series(sdf, "s", "v")


def test_svg_escapes_markup_characters():
    """Series names / titles containing &, <, > must be XML-escaped —
    'AT&T' used to produce malformed markup that SVG parsers reject."""
    import xml.etree.ElementTree as ET

    from sparkwrangle.jobs.report import line_chart_svg

    svg = line_chart_svg(
        [("AT&T", 0.0, 1.0), ("AT&T", 1.0, 2.0), ("a<b", 0.0, 3.0)],
        title="p&l <net>",
    )
    assert "AT&amp;T" in svg and "a&lt;b" in svg
    ET.fromstring(svg)  # parses as well-formed XML


def test_profile_table_cli_shape(spark):
    """One-pass sketch profiler: plausible HLL cardinalities (events has
    exactly 5 event types, ~150 users at sf0.001-scale fixtures), bin
    quantiles for numeric columns, CMS top-10 with est >= exact."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from profile_table import profile_table

    from conftest import SF_ORACLE

    out = profile_table(spark, SF_ORACLE, "events", "user_id")
    assert out["n_rows"] > 0
    et = out["columns"]["event_type"]["approx_distinct"]
    assert abs(et - 5) / 5 < 0.25
    uid = out["columns"]["user_id"]["approx_distinct"]
    exact_uid = 150
    assert abs(uid - exact_uid) / exact_uid < 0.25
    assert "quantiles" in out["columns"]["value"]
    hh = out["heavy_hitters"]["top"]
    assert len(hh) == 10
    assert all(h["cms_est"] >= h["exact"] for h in hh)
