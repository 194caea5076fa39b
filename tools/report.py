"""Render an SVG line-chart report from a testdata table — the A5
report sink end to end (jobs/report.py).

Usage: python tools/report.py [sf_dir] [out.svg]

Downsamples events.value per event_type over time ON the cluster
(bounded by series × max_points whatever the input size), renders the
deterministic SVG driver-side, and prints a one-line JSON summary.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sparkwrangle.io import load_table
from sparkwrangle.jobs.report import write_report_svg
from sparkwrangle.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "report.svg"
    spark = get_spark("report")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")
    svg = write_report_svg(
        ev,
        out,
        "ts",
        "value",
        "event_type",
        max_points=200,
        title=f"events.value by type — {Path(sf_dir).name}",
    )
    print(
        json.dumps(
            {
                "out": out,
                "bytes": len(svg),
                "series": svg.count("<polyline"),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
