"""Streaming incremental dedup: map-side signatures + stream-static
band join (streaming/incremental.py).

Two contracts:
* the zero-shuffle map-side MinHash signature is bit-identical to the
  aggregate form (min over the array multiset == min over the set);
* the stream emits exactly the batch incremental path's new×corpus
  candidate pairs, whatever the micro-batch split.
"""

from __future__ import annotations

import os

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from sparkwrangle.io import load_table


def test_mapside_sigs_match_aggregate(spark):
    from sparkwrangle.ext.dedup import (
        mapside_minhash_sigs,
        minhash_signatures,
        shingles,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    agg = minhash_signatures(
        shingles(docs, "doc_id", "text", 3, distinct=False), "doc_id", k=16
    )
    mapside = mapside_minhash_sigs(docs, "doc_id", "text", n=3, k=16)
    a = sorted(tuple(r) for r in agg.collect())
    b = sorted(tuple(r) for r in mapside.collect())
    assert a == b and len(a) > 0


def test_mapside_sigs_edge_cases(spark):
    """Equality holds on adversarial docs: empty text, fewer tokens than
    n (both forms drop them), exactly n tokens, all-identical shingles
    (multiset vs set), punctuation-only, unicode, very long repetition."""
    from sparkwrangle.ext.dedup import (
        mapside_minhash_sigs,
        minhash_signatures,
        shingles,
    )

    rows = [
        (1, ""),
        (2, "one"),
        (3, "one two"),
        (4, "one two three"),
        (5, "a a a a a a a a"),  # one distinct shingle, many copies
        (6, "!!! ... ??? ---"),  # tokenizes to nothing
        (7, "héllo wörld çafe über naïve"),
        (8, " ".join(["tok%d" % (i % 5) for i in range(500)])),
        (9, "Mixed CASE Tokens mixed case tokens"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    agg = minhash_signatures(
        shingles(docs, "doc_id", "text", 3, distinct=False), "doc_id", k=16
    )
    mapside = mapside_minhash_sigs(docs, "doc_id", "text", n=3, k=16)
    a = sorted(tuple(r) for r in agg.collect())
    b = sorted(tuple(r) for r in mapside.collect())
    assert a == b
    # docs 1, 2, 6 (and 3 if tokenizer yields <3) produce no signature
    present = {t[0] for t in b}
    assert 1 not in present and 2 not in present and 6 not in present
    assert {4, 5, 7, 8, 9} <= present


def _expected_new_corpus_pairs(spark, docs):
    """Full LSH candidate self-join restricted to pairs with EXACTLY one
    side in the new batch (src0) — the streaming operator's contract."""
    from sparkwrangle.ext.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    sigs = minhash_signatures(
        shingles(docs, "doc_id", "text", 3, distinct=False), "doc_id", k=16
    )
    cand = lsh_candidate_pairs(sigs, "doc_id", k=16, bands=4)
    src = docs.select("doc_id", "source")
    out = (
        cand.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")), "id_b")
        .filter((F.col("sa") == "src0") != (F.col("sb") == "src0"))
    )
    return {(r.id_a, r.id_b) for r in out.select("id_a", "id_b").collect()}


def test_incremental_pairs_stream_matches_batch(spark, tmp_path):
    from sparkwrangle.ext.dedup import minhash_signatures, shingles
    from sparkwrangle.streaming.incremental import (
        corpus_band_table,
        incremental_pairs_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    want = _expected_new_corpus_pairs(spark, docs)
    assert want  # sf0.001 has cross-source near-dups by construction

    corpus = docs.filter(F.col("source") != "src0")
    corpus_bands = corpus_band_table(
        minhash_signatures(
            shingles(corpus, "doc_id", "text", 3, distinct=False), "doc_id", k=16
        )
    ).localCheckpoint()  # static side: materialized once, like the prepared table

    new_docs = docs.filter(F.col("source") == "src0").withColumn(
        "ts",
        (F.lit(1704067200) + F.col("doc_id")).cast("timestamp"),
    )

    # batch form of the same operator (watermark no-op)
    got_batch = {
        (r.id_a, r.id_b)
        for r in incremental_pairs_stream(new_docs, corpus_bands).collect()
    }
    assert got_batch == want

    # stream the new batch in two files
    d = str(tmp_path / "inc")
    os.makedirs(d)
    mid = new_docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    new_docs.filter(F.col("doc_id") <= mid).coalesce(1).write.parquet(
        os.path.join(d, "b1")
    )
    new_docs.filter(F.col("doc_id") > mid).coalesce(1).write.parquet(
        os.path.join(d, "b2")
    )
    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long, ts timestamp"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(d, "*"))
    )
    out = incremental_pairs_stream(stream, corpus_bands)
    q = (
        out.writeStream.format("memory")
        .queryName("inc_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    got = {
        (r.id_a, r.id_b)
        for r in spark.sql("SELECT id_a, id_b FROM inc_sink").collect()
    }
    assert got == want


def test_pq_encode_mapside_on_stream(spark, tmp_path):
    """The literal-fold PQ encoder is a pure projection, so it runs on a
    stream with no state — per-micro-batch codes equal the batch codes
    whatever the file split."""
    from sparkwrangle.ext.similarity import (
        collect_codebooks,
        pq_codebooks,
        pq_encode_mapside,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cb = pq_codebooks(emb, m=8, d_sub=8).localCheckpoint()
    rows = collect_codebooks(cb)
    want = sorted(tuple(r) for r in pq_encode_mapside(emb, rows).collect())

    d = str(tmp_path / "pqstream")
    os.makedirs(d)
    mid = emb.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    emb.filter(F.col("vec_id") <= mid).coalesce(1).write.parquet(
        os.path.join(d, "b1")
    )
    emb.filter(F.col("vec_id") > mid).coalesce(1).write.parquet(
        os.path.join(d, "b2")
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(d, "*"))
    )
    out = pq_encode_mapside(stream, rows)
    q = (
        out.writeStream.format("memory")
        .queryName("pq_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM pq_sink").collect())
    assert got == want


def test_streaming_ann_serving_matches_batch_probe(spark, tmp_path):
    """A stream of query vectors served via foreachBatch against the
    persisted PQ index answers EXACTLY what the batch probe answers for
    the same queries — the online face of build-once/query-many. Two
    micro-batches (maxFilesPerTrigger=1) exercise index reuse across
    batches; results carry the batch id (the idempotent replay unit)."""
    import sys
    from pathlib import Path

    from pyspark.sql import functions as F

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import ann
    from conftest import SF_SMOKE

    from sparkwrangle.ext.similarity import pq_adc_from_index
    from sparkwrangle.io import load_table
    from sparkwrangle.streaming.ann_serving import serve_ann_stream

    idx = str(tmp_path / "idx")
    ann.build(spark, SF_SMOKE, idx)

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q1 = emb.filter(F.col("vec_id").isin([0, 1, 2]))
    q2 = emb.filter(F.col("vec_id").isin([3, 4]))
    qdir = str(tmp_path / "queries")
    q1.coalesce(1).write.parquet(f"{qdir}/b0")
    q2.coalesce(1).write.parquet(f"{qdir}/b1")

    schema = emb.schema.simpleString()[7:-1].replace(":", " ")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir + "/*")
    )
    out_dir = str(tmp_path / "answers")
    q = serve_ann_stream(
        stream, idx, out_dir, str(tmp_path / "ckpt"), k=5
    )
    assert q.awaitTermination(600)

    got = {
        (r.query_id, r.rk): (r.neighbor_id, round(r.adc_dist, 9))
        for r in spark.read.parquet(out_dir).collect()
    }
    codes = spark.read.parquet(f"{idx}/codes.parquet")
    cb = spark.read.parquet(f"{idx}/codebooks.parquet")
    want = {
        (r.query_id, r.rk): (r.neighbor_id, round(r.adc_dist, 9))
        for r in pq_adc_from_index(
            codes, cb, emb.filter(F.col("vec_id") < 5), k=5
        ).collect()
    }
    assert got == want
    batches = {r.batch_id for r in spark.read.parquet(out_dir).collect()}
    assert len(batches) == 2  # two micro-batches really served

    # index-coverage validation: asking the persisted index for the wrong
    # m must raise loudly, not rank by a prefix of the true distance
    import pytest

    with pytest.raises(ValueError, match="subspaces"):
        pq_adc_from_index(codes, cb, emb.filter(F.col("vec_id") < 2), k=5, m=4, d_sub=16)


def test_ann_serving_replayed_batch_overwrites_not_duplicates(spark, tmp_path):
    """ADVICE r4: the serving sink must be IDEMPOTENT under foreachBatch
    replay — a batch re-run after a crash between write and checkpoint
    commit (simulated by deleting the checkpoint and replaying the same
    source) overwrites its own batch_id partition instead of appending a
    second copy of the rows."""
    import shutil
    import sys
    from pathlib import Path

    from pyspark.sql import functions as F

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import ann
    from conftest import SF_SMOKE

    from sparkwrangle.io import load_table
    from sparkwrangle.streaming.ann_serving import serve_ann_stream

    idx = str(tmp_path / "idx")
    ann.build(spark, SF_SMOKE, idx)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qdir = str(tmp_path / "queries")
    emb.filter(F.col("vec_id").isin([0, 1, 2])).coalesce(1).write.parquet(
        f"{qdir}/b0"
    )
    schema = emb.schema.simpleString()[7:-1].replace(":", " ")
    out_dir = str(tmp_path / "answers")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(qdir + "/*")
        )
        q = serve_ann_stream(
            stream, idx, out_dir, str(tmp_path / "ckpt"), k=5
        )
        assert q.awaitTermination(600)

    run()
    first = sorted(
        (r.query_id, r.rk, r.neighbor_id)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert first  # served something
    # crash-replay: lose the checkpoint, replay the same batch
    shutil.rmtree(str(tmp_path / "ckpt"))
    run()
    second = sorted(
        (r.query_id, r.rk, r.neighbor_id)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert second == first  # overwritten, NOT doubled
