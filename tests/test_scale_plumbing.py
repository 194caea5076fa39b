"""Scale-plumbing tests: partitioned write → partition pruning on read;
salted two-phase aggregation equals the plain aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkwrangle.io import load_table, write_table
from sparkwrangle.ops.skew import salted_agg

from conftest import SF_SMOKE


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_part")
    write_table(ev, path, partition_by=["event_date"])

    back = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-05")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "2024-01-05" in plan  # static partition pruning reached the scan
    expected = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert back.count() == expected


def test_salted_agg_matches_plain(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    plain = {
        (r.event_type,): (r.n, r.total, r.vmin, r.vmax)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    salted = {
        (r.event_type,): (r.n, round(r.total, 6), r.vmin, r.vmax)
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": ("count", "*"),
                "total": ("sum", "value"),
                "vmin": ("min", "value"),
                "vmax": ("max", "value"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        pn, pt, pmin, pmax = plain[k]
        sn, st_, smin, smax = salted[k]
        assert pn == sn and pmin == smin and pmax == smax
        assert abs(pt - st_) < 1e-5


def test_bucketed_join_avoids_shuffle(spark):
    """Two tables bucketed on the join key join without an Exchange —
    the co-located-join layout SCALE.md promises for repeated fact joins."""
    from sparkwrangle.io import write_bucketed

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8, sort_col="l_orderkey")
    write_bucketed(o, "o_bucketed", "o_orderkey", 8, sort_col="o_orderkey")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("li_bucketed")
        b = spark.table("o_bucketed")
        j = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert j.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_curated_corpus_write_matches_keep_list(spark, tmp_path):
    """tools/curate.py's write path: the curated corpus holds exactly the
    keep-list's documents, partitioned by language for pruning."""
    from sparkwrangle.catalog import CATALOG
    from sparkwrangle.io import load_table, write_table

    sf = SF_SMOKE
    out = str(tmp_path / "curated")
    docs = load_table(spark, sf, "documents")
    keep = CATALOG["x_curation_pipeline_end_to_end"].fn(spark, sf)
    curated = docs.join(keep.select("doc_id"), "doc_id").select(
        "doc_id", "lang", "source", "text", "n_chars"
    )
    write_table(curated, f"{out}/documents.parquet", partition_by=["lang"])
    back = spark.read.parquet(f"{out}/documents.parquet")
    assert back.count() == keep.count()
    kept_ids = {r.doc_id for r in keep.select("doc_id").collect()}
    got_ids = {r.doc_id for r in back.select("doc_id").collect()}
    assert got_ids == kept_ids
