"""Benchmark harness: runs the full query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line as the FINAL stdout line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {<5 slowest>: sec}, "n_queries": N, "sf": ...}

The full per-query timing dict is written to BENCH_DETAIL.json next to
this file (the all-85-key dict made the final line too long for the
driver's capture in round 1 — BENCH_r01.json came back ``parsed: null``).

Each query is timed end-to-end (plan + execute + drain into a noop sink).
A warmup query absorbs JVM/codegen startup so the numbers measure the
plans, not session boot; table loads are memoized per-session in
sparkwrangle.io so per-query parquet listing/footer reads don't mask
plan regressions.
"""

from __future__ import annotations

import json
import re
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sparkwrangle.catalog import CATALOG
from sparkwrangle.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # tolerate non-sf<number> directory names (partial-dataset layouts):
    # the sf field is informational, never worth crashing the bench over
    _m = re.fullmatch(r"sf([0-9.]+)", Path(sf_dir).name)
    sf = float(_m.group(1)) if _m else None
    spark = get_spark("sparkwrangle-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: absorb ONE-TIME session machinery costs so per-query numbers
    # measure the plans, not session boot — the parquet reader (via a real
    # catalog scan), plus a SYNTHETIC plan (not any timed query) touching
    # each machinery class once: createDataFrame, a window, a broadcast
    # join, localCheckpoint, the python-worker fork for pandas UDFs, and
    # the noop sink itself. Without this, the first timed query of each
    # class silently carries its init (measured ~1s extra on the first
    # .save(), ~1s on the first applyInPandas worker fork).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    CATALOG["a_scan_pushdown"].fn(spark, sf_dir).count()
    _wdf = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], "k int, v double")
    _wj = (
        _wdf.join(F.broadcast(_wdf.select("k")), "k")
        .withColumn("r", F.row_number().over(Window.partitionBy("k").orderBy("v")))
    )
    _wj.localCheckpoint().write.format("noop").mode("overwrite").save()
    _wdf.groupBy("k").applyInPandas(
        lambda pdf: pdf, "k int, v double"
    ).write.format("noop").mode("overwrite").save()

    # Opt-in repetitions for local measurement on noisy hosts (this box's
    # effective speed fluctuates several-fold between windows — NOTES.md).
    # Default 1 keeps the driver-observed metric exactly what it always
    # was: one cold build+drain per query.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1")))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, spec in sorted(CATALOG.items()):
        best = None
        for i in range(reps):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # Drain the full result (what the driver's correctness pass
            # does) without driver-side materialization cost dominating.
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i == 0:
                cold[name] = round(dt, 4)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    # Record the first-pass (cold) numbers NEXT TO the min-of-N so a
    # driver-vs-builder delta is attributable: the driver runs reps=1
    # (value == value_cold there), while a committed local record should
    # carry both — this host's effective speed swings ±15% between runs
    # on identical code (round-6 verdict), and a single overwritten
    # number cannot distinguish regression from noise.
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(
        json.dumps(
            {
                "metric": "sparkwrangle catalog wall-clock",
                "value": total,
                "unit": "sec",
                "reps": reps,
                "value_cold": round(sum(cold.values()), 4),
                "queries": timings,
                "queries_cold": cold,
                "sf": sf,
            },
            indent=2,
        )
    )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    print(
        json.dumps(
            {
                "metric": "sparkwrangle catalog wall-clock",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "sf": sf,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
