"""One-pass table profiler built from the white-box sketches — the
pre-flight check a pipeline runs before committing a 100 TB job: row
count, approximate distinct cardinality per column (HLL), heavy hitters
for a chosen column (CMS + exact top-k comparison on the aggregated
table), and p50/p90/p99 for numeric columns (equi-width histogram).

Usage: python tools/profile_table.py [sf_dir] [table] [heavy_hitter_col]

Every statistic is a constant-size aggregate (registers / counters /
bins), so the same profile runs at any scale; nothing but sketch tables
ever reaches the driver.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from sparkwrangle.ext.sketches import (
    cms_estimates,
    cms_sketch,
    histogram_quantiles,
    hll_estimate,
    hll_registers,
)
from sparkwrangle.io import load_table
from sparkwrangle.session import get_spark


def profile_table(spark, sf_dir: str, table: str, hh_col: str | None = None) -> dict:
    df = load_table(spark, sf_dir, table)
    out: dict = {"table": table, "n_rows": df.count(), "columns": {}}
    numeric = [
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    ]
    for name in df.columns:
        items = df.select(F.col(name).cast("string").alias("item")).filter(
            F.col("item").isNotNull()
        )
        est = hll_estimate(hll_registers(items, "item")).collect()[0]
        # all-NULL column → hll_raw = 0.0 (empty-input coalesce lives in
        # hll_estimate itself now, not in each caller)
        out["columns"][name] = {"approx_distinct": round(est.hll_raw, 1)}
    for name in numeric:
        qs = histogram_quantiles(df, name, [0.5, 0.9, 0.99]).collect()
        out["columns"][name]["quantiles"] = {
            str(r.p): round(r.est, 6) for r in qs
        }
    if hh_col:
        items = df.select(F.col(hh_col).cast("string").alias("item")).filter(
            F.col("item").isNotNull()
        )
        sketch = cms_sketch(items, "item")
        exact = items.groupBy("item").agg(F.count("*").alias("exact_cnt"))
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("exact_cnt"), F.asc("item"))
        topk = exact.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= 10
        )
        hh = cms_estimates(topk, sketch, "item").orderBy("rk").collect()
        out["heavy_hitters"] = {
            "column": hh_col,
            "top": [
                {"item": r.item, "exact": r.exact_cnt, "cms_est": r.cms_est}
                for r in hh
            ],
        }
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    table = sys.argv[2] if len(sys.argv) > 2 else "events"
    hh_col = sys.argv[3] if len(sys.argv) > 3 else "user_id"
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(profile_table(spark, sf_dir, table, hh_col)))


if __name__ == "__main__":
    main()
