"""Ingest-time corpus preparation — the 100 TB dedup layout.

Every ad-hoc dedup query pays the tokenize → explode → distinct subtree
again (twice, for self-joins — measured ~2 s per branch at sf0.1, and at
corpus scale a full re-scan of the text). The production layout
materializes that work ONCE at ingest:

* ``shingles.parquet``      — (doc_id, shingle), distinct
* ``minhash_sigs.parquet``  — (doc_id, mh0..mh{k-1})
* ``text_hashes.parquet``   — (doc_id, text_hash) normalized exact-dup key

after which every dedup family consumer (exact groups, LSH candidates,
Jaccard verification, clustering) is a scan + join over columnar tables
that never touch the raw text. In-session caching is NOT a substitute:
``.cache()`` breaks whole-stage pipelines (measured slower), and cached
state dies with the session — a written table amortizes across every
query, session, and engine that follows.

The from-prepared operators below mirror their from-scratch twins in
``ext.dedup`` exactly (equality is pinned by tests), so correctness work
done against the ad-hoc path transfers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkwrangle.ext.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    normalize_text,
    shingles,
)
from sparkwrangle.ext.hashing import h60


def prepare_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n: int = 3,
    k: int = 16,
) -> None:
    """Materialize the dedup building blocks for a corpus. The signature
    table is derived from the WRITTEN shingle table (one extra scan of
    columnar data) rather than recomputing the text subtree."""
    sh = shingles(docs, "doc_id", "text", n)
    sh.write.mode("overwrite").parquet(f"{out_dir}/shingles.parquet")
    sh_mat = spark.read.parquet(f"{out_dir}/shingles.parquet")
    minhash_signatures(sh_mat, "doc_id", k=k).write.mode("overwrite").parquet(
        f"{out_dir}/minhash_sigs.parquet"
    )
    # NULL-hash rule matches exact_dup_groups: NULL/empty-normalizing
    # texts are not duplicates of each other (see dedup.exact_dup_groups)
    _norm = normalize_text(F.col("text"))
    docs.select(
        "doc_id", F.when(_norm != "", h60(_norm)).alias("text_hash")
    ).write.mode("overwrite").parquet(f"{out_dir}/text_hashes.parquet")


def load_prepared(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    return {
        "shingles": spark.read.parquet(f"{out_dir}/shingles.parquet"),
        "sigs": spark.read.parquet(f"{out_dir}/minhash_sigs.parquet"),
        "text_hashes": spark.read.parquet(f"{out_dir}/text_hashes.parquet"),
    }


def lsh_pairs_from_prepared(
    spark: SparkSession, out_dir: str, k: int = 16, bands: int = 4
) -> DataFrame:
    """LSH candidate pairs from the materialized signature table — no text
    scan, no shingle recompute; the banding self-join reads one columnar
    table twice."""
    sigs = load_prepared(spark, out_dir)["sigs"]
    return lsh_candidate_pairs(sigs, "doc_id", k=k, bands=bands)


def jaccard_from_prepared(
    spark: SparkSession,
    out_dir: str,
    threshold: float = 0.0,
    max_df: int | None = 20,
) -> DataFrame:
    """Exact n-gram Jaccard from the materialized shingle table."""
    sh = load_prepared(spark, out_dir)["shingles"]
    return ngram_jaccard_pairs(sh, "doc_id", threshold=threshold, max_df=max_df)


def exact_dup_groups_from_prepared(spark: SparkSession, out_dir: str) -> DataFrame:
    """Exact-dup group sizes from the materialized normalized-hash table
    (NULL text_hash → dup_count 1, the exact_dup_groups rule)."""
    from pyspark.sql import Window

    th = load_prepared(spark, out_dir)["text_hashes"]
    w = Window.partitionBy("text_hash")
    return th.withColumn(
        "dup_count",
        F.when(F.col("text_hash").isNull(), F.lit(1)).otherwise(
            F.count("*").over(w)
        ),
    )


def incremental_lsh_pairs(
    spark: SparkSession,
    out_dir: str,
    new_docs: DataFrame,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Operational incremental dedup: candidate pairs touching a NEW batch
    of documents, against a prepared corpus — without recomputing anything
    corpus-side.

    Only the new batch pays tokenize/shingle/signature cost, and the
    banding join probes (corpus ∪ new) bands WITH new-batch bands only —
    corpus×corpus pairs are never generated (they were handled when
    those docs were ingested). At 100 TB this is the daily-ingest shape:
    cost scales with |batch| × bucket hit rate; the corpus contributes a
    columnar scan of its signature table, not a self-join. Pair ids are
    ordered (id_a < id_b) so output matches a full from-scratch run
    restricted to pairs touching the new batch (pinned by test).

    New doc_ids must not collide with corpus doc_ids (the ingest contract
    — monotone ids).
    """
    from sparkwrangle.ext.dedup import band_explode

    new_sh = shingles(new_docs, "doc_id", "text", n)
    new_sigs = minhash_signatures(new_sh, "doc_id", k=k)
    corpus_sigs = load_prepared(spark, out_dir)["sigs"]
    all_bands = band_explode(
        corpus_sigs.union(new_sigs.select(corpus_sigs.columns)), "doc_id", k, bands
    )
    new_bands = band_explode(new_sigs, "doc_id", k, bands).select(
        F.col("doc_id").alias("_nid"), "band", "bh"
    )
    # no forced broadcast: new_bands scales with the INGEST BATCH (a
    # daily web-scale batch is not structurally bounded) — statistics/
    # AQE broadcast it when the batch is actually small and fall back to
    # a shuffled equi-join otherwise; corpus bands never self-join
    hits = all_bands.join(new_bands, ["band", "bh"]).filter(
        F.col("doc_id") != F.col("_nid")
    )
    return (
        hits.select(
            F.least("doc_id", "_nid").alias("id_a"),
            F.greatest("doc_id", "_nid").alias("id_b"),
        )
        .distinct()
    )
