"""A5 — report/plot sink, dependency-free (SURVEY.md §2.A5).

The reference renders matplotlib balance/price charts from eagerly
materialized frames (stock_arbitrage.ipynb:468 cell 8;
intra_day_arbitrage.ipynb:11213-11215 cell 31). An engine cannot
``toPandas()`` a 100 TB series to plot it, and this container has no
matplotlib — so the sink is split into the two halves that actually
matter at scale:

1. ``downsample_series`` — DISTRIBUTED: bucket the x-axis into at most
   ``max_points`` intervals per series and aggregate y per bucket
   (mean + min/max band). All shuffles are on (series, bucket); the
   result is bounded by series_count × max_points rows no matter the
   input size. This half is oracle-checked (``a_plot_downsample``).
2. ``line_chart_svg`` — DRIVER-SIDE, bounded input only: renders the
   downsampled rows as a standalone SVG line chart with axes, ticks and
   a legend. Pure string assembly — no plotting library — and fully
   deterministic (same rows → byte-identical SVG), so it is golden-
   testable. Swap point for matplotlib where available.

``write_report_svg`` composes the two: downsample on the cluster, then
render and write one small SVG file from the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deliberately small, print-safe palette; cycled per series (sorted order)
_PALETTE = ["#1f77b4", "#d62728", "#2ca02c", "#9467bd", "#ff7f0e", "#8c564b"]


def downsample_series(
    df: DataFrame,
    x_col: str,
    y_col: str,
    series_col: str | None = None,
    max_points: int = 200,
) -> DataFrame:
    """Bucket ``x_col`` into ``max_points`` equal-width intervals and
    aggregate ``y_col`` per (series, bucket): mean (decimal-accumulated,
    order-insensitive) plus min/max for an error band.

    Output columns: series, bucket, x_mid, y_avg, y_min, y_max, n — at
    most series_count × max_points rows, computed with one shuffle on
    (series, bucket). The x range comes from a global min/max aggregate
    broadcast back onto the rows (two scalar rows, never a driver
    collect); integer arithmetic keeps bucket assignment exact across
    engines.
    """
    x = F.col(x_col)
    # epoch seconds for timestamps, epoch days for dates, raw value for
    # numerics — integer math throughout. Anything else is rejected up
    # front: a string x would silently null-cast and filter EVERY row,
    # and Spark disallows date→bigint outright (plan-time error).
    dt = dict(df.dtypes)[x_col]
    if dt in ("timestamp", "timestamp_ntz"):
        xi = F.unix_timestamp(x)
    elif dt == "date":
        xi = F.datediff(x, F.lit("1970-01-01")).cast("bigint")
    elif dt in ("tinyint", "smallint", "int", "bigint", "float", "double") or dt.startswith(
        "decimal"
    ):
        xi = x.cast("bigint")
    else:
        raise ValueError(
            f"downsample_series: x_col {x_col!r} has unplottable type {dt}"
        )
    base = df.select(
        (
            F.col(series_col).cast("string")
            if series_col
            else F.lit("all")
        ).alias("series"),
        xi.alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    rng = base.agg(
        F.min("_x").alias("_xmin"), F.max("_x").alias("_xmax")
    )
    n = F.lit(int(max_points))
    span = F.col("_xmax") - F.col("_xmin") + F.lit(1)  # ints: exact
    # floor(), never cast(double→bigint): Spark's cast truncates toward
    # zero while DuckDB's rounds — floor is the same IEEE op in both.
    # Magnitudes stay < 2^52 (epoch-seconds span × max_points), so the
    # double arithmetic is exact and the bucket id is engine-identical.
    bucketed = base.join(F.broadcast(rng)).select(
        "series",
        "_x",
        "_y",
        F.floor((F.col("_x") - F.col("_xmin")) * n / span).alias("bucket"),
        F.col("_xmin"),
        span.alias("_span"),
    )
    return (
        bucketed.groupBy("series", "bucket")
        .agg(
            F.min("_xmin").alias("_xmin"),
            F.min("_span").alias("_span"),
            F.sum(F.col("_y").cast("decimal(25,8)")).cast("double").alias("_ysum"),
            F.count("*").alias("n"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
        )
        .select(
            "series",
            "bucket",
            # bucket midpoint as an OFFSET from the x minimum (floor-exact
            # center). Offsets are shift-invariant, so they hash identically
            # whatever session timezone epoch extraction ran under; x_mid
            # adds the minimum back for absolute-axis charts.
            F.floor(
                (F.col("bucket") * F.col("_span") + F.floor(F.col("_span") / 2))
                / n
            ).alias("x_off"),
            (
                F.col("_xmin")
                + F.floor(
                    (
                        F.col("bucket") * F.col("_span")
                        + F.floor(F.col("_span") / 2)
                    )
                    / n
                )
            ).alias("x_mid"),
            F.round(F.col("_ysum") / F.col("n"), 6).alias("y_avg"),
            "y_min",
            "y_max",
            "n",
        )
    )


def _fmt(v: float) -> str:
    """Fixed-format numbers so the SVG is byte-deterministic."""
    return f"{v:.6g}"


def line_chart_svg(
    rows,
    title: str = "",
    width: int = 960,
    height: int = 480,
    x_label: str = "x",
    y_label: str = "y",
) -> str:
    """Render (series, x, y) triples as a standalone SVG line chart.

    ``rows`` is any iterable of (series, x, y) with numeric x/y — the
    BOUNDED output of ``downsample_series``, never a raw table. Pure
    string assembly, deterministic: series sorted by name, points by x.
    """
    from xml.sax.saxutils import escape as _esc

    # every user-controlled string (title, labels, series names) is
    # XML-escaped — a series like "AT&T" or a "<" in the title would
    # otherwise produce malformed markup that SVG parsers reject whole
    title, x_label, y_label = _esc(title), _esc(x_label), _esc(y_label)
    pts: dict[str, list[tuple[float, float]]] = {}
    for s, x, y in rows:
        if x is None or y is None:
            continue
        pts.setdefault(_esc(str(s)), []).append((float(x), float(y)))
    margin, mtop = 60, 40
    iw, ih = width - 2 * margin, height - mtop - margin
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    if title:
        out.append(
            f'<text x="{width // 2}" y="24" text-anchor="middle" '
            f'font-family="sans-serif" font-size="16">{title}</text>'
        )
    if not pts:
        out.append("</svg>")
        return "\n".join(out)
    allx = [x for p in pts.values() for x, _ in p]
    ally = [y for p in pts.values() for _, y in p]
    xmin, xmax = min(allx), max(allx)
    ymin, ymax = min(ally), max(ally)
    xs = iw / ((xmax - xmin) or 1.0)
    ys = ih / ((ymax - ymin) or 1.0)

    def sx(x: float) -> float:
        return margin + (x - xmin) * xs

    def sy(y: float) -> float:
        return mtop + ih - (y - ymin) * ys

    # axes + 5 ticks each
    out.append(
        f'<g stroke="#333" stroke-width="1">'
        f'<line x1="{margin}" y1="{mtop}" x2="{margin}" y2="{mtop + ih}"/>'
        f'<line x1="{margin}" y1="{mtop + ih}" x2="{margin + iw}" '
        f'y2="{mtop + ih}"/></g>'
    )
    for i in range(5):
        tx = xmin + (xmax - xmin) * i / 4
        ty = ymin + (ymax - ymin) * i / 4
        out.append(
            f'<text x="{_fmt(sx(tx))}" y="{mtop + ih + 20}" '
            f'text-anchor="middle" font-family="sans-serif" '
            f'font-size="11">{_fmt(tx)}</text>'
        )
        out.append(
            f'<text x="{margin - 8}" y="{_fmt(sy(ty) + 4)}" '
            f'text-anchor="end" font-family="sans-serif" '
            f'font-size="11">{_fmt(ty)}</text>'
        )
    out.append(
        f'<text x="{margin + iw // 2}" y="{height - 12}" text-anchor="middle" '
        f'font-family="sans-serif" font-size="12">{x_label}</text>'
    )
    out.append(
        f'<text x="16" y="{mtop + ih // 2}" text-anchor="middle" '
        f'font-family="sans-serif" font-size="12" '
        f'transform="rotate(-90 16 {mtop + ih // 2})">{y_label}</text>'
    )
    for i, name in enumerate(sorted(pts)):
        color = _PALETTE[i % len(_PALETTE)]
        series = sorted(pts[name])
        path = " ".join(f"{_fmt(sx(x))},{_fmt(sy(y))}" for x, y in series)
        out.append(
            f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{path}"><title>{name}</title></polyline>'
        )
        ly = mtop + 16 * i
        out.append(
            f'<g><rect x="{margin + iw - 150}" y="{ly}" width="12" '
            f'height="12" fill="{color}"/>'
            f'<text x="{margin + iw - 132}" y="{ly + 10}" '
            f'font-family="sans-serif" font-size="11">{name}</text></g>'
        )
    out.append("</svg>")
    return "\n".join(out)


def write_report_svg(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    series_col: str | None = None,
    max_points: int = 200,
    title: str = "",
) -> str:
    """The A5 sink: distributed downsample → driver-side SVG render →
    one small file. The collect is bounded by series × max_points by
    construction. Returns the SVG text (also written to ``path``)."""
    small = downsample_series(df, x_col, y_col, series_col, max_points)
    rows = [
        (r["series"], r["x_mid"], r["y_avg"])
        for r in small.select("series", "x_mid", "y_avg").collect()
    ]
    svg = line_chart_svg(
        rows, title=title, x_label=x_col, y_label=f"avg({y_col})"
    )
    with open(path, "w") as f:
        f.write(svg)
    return svg
