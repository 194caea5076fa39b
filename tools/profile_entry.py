"""Isolate and profile catalog entries (guide §1): per-entry noop-sink
timing (--reps runs TOTAL: one cold build+drain, then reps-1 warm
re-runs) plus the formatted plan,
away from the full-catalog loop so one entry's numbers aren't polluted
by session state built by its neighbors.

Usage:
    python tools/profile_entry.py <entry> [<entry> ...] [--reps N]
        [--plan-dir plans/r13] [--suffix before|after] [--sf DIR]

Writes <plan-dir>/<entry>_<suffix>.txt when --plan-dir is given and
prints one line per entry: cold and min-warm seconds.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sparkwrangle.catalog import CATALOG  # noqa: E402
from sparkwrangle.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("profile-entry")
    spark.sparkContext.setLogLevel("ERROR")
    # Same warmup classes as bench.py so the cold number measures the
    # entry, not session machinery.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    CATALOG["a_scan_pushdown"].fn(spark, args.sf).count()
    _wdf = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double")
    _wj = _wdf.join(F.broadcast(_wdf.select("k")), "k").withColumn(
        "r", F.row_number().over(Window.partitionBy("k").orderBy("v"))
    )
    _wj.localCheckpoint().write.format("noop").mode("overwrite").save()
    _wdf.groupBy("k").applyInPandas(lambda p: p, "k int, v double").write.format(
        "noop"
    ).mode("overwrite").save()

    for name in args.entries:
        spec = CATALOG[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, args.sf)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_cold = time.perf_counter() - t0
        warms = []
        for _ in range(max(0, args.reps - 1)):
            t0 = time.perf_counter()
            d2 = spec.fn(spark, args.sf)
            d2.write.format("noop").mode("overwrite").save()
            warms.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        if args.plan_dir:
            pdir = Path(args.plan_dir)
            pdir.mkdir(parents=True, exist_ok=True)
            import contextlib
            import io as _io

            buf = _io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (pdir / f"{name}_{args.suffix}.txt").write_text(buf.getvalue())
        wmin = min(warms) if warms else float("nan")
        print(
            f"{name}: build={t_build:.3f}s cold={t_cold:.3f}s "
            f"warm_min={wmin:.3f}s warms={[round(w, 3) for w in warms]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
