"""Streaming corpus curation — the ingest-time twin of the batch
curation pipeline (catalog_ext.x_curation_pipeline_end_to_end).

Per micro-batch, each arriving document is quality-scored, PII-redacted,
decontaminated against the eval shingle-hash set, and exact-deduped
within the watermark horizon. Differences from the batch pipeline are
inherent to streaming and documented here:

* quality uses an ABSOLUTE threshold, not a per-language percentile —
  a percentile over the full stream is unbounded state; re-rank
  offline if quantile pruning is required.
* dedup is exact (normalized-text hash) keep-first within the
  watermark, not MinHash-LSH — candidate generation across the whole
  history is unbounded state; the incremental LSH path
  (ext.prepared.incremental_lsh_pairs) covers batch-vs-corpus near-dup
  at ingest boundaries instead.
* decontamination must stay STATELESS: a join back onto per-doc flags
  derived from the same stream would be a (forbidden) stream-stream
  anti join. Instead the doc's shingle hashes are built map-side as an
  ARRAY column and tested against the eval suite via a stream-static
  LEFT ANTI join (static right side — stateless and supported): the
  persisted eval-hash table folds to a one-row array by a distributed
  collect_set agg and broadcasts, with arrays_overlap as the join
  condition. No driver collect anywhere — the eval suite stays a
  table end to end; callers may still pass a literal hash list, which
  probes map-side with the same semantics.

The whole pipeline is stateless except the final dropDuplicates, so it
chains legally in append mode. Every transformation works identically
on a batch DataFrame (the watermark is a no-op there) — the parity test
pins stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkwrangle.ext.dedup import (
    normalize_text,
    shingle_hash_array,
    shingles,
)
from sparkwrangle.ext.hashing import h60
from sparkwrangle.ext.text import add_text_stats, redact_pii


def eval_shingle_hashes(eval_docs: DataFrame, n: int = 8) -> DataFrame:
    """Static decontamination set: distinct n-gram shingle hashes of the
    held-out eval corpus as a single-column ``shash`` DataFrame. Persist
    it once (an eval suite is small and static by construction) and hand
    it to ``curate_stream`` — the set stays a table end to end, never a
    driver-side list."""
    return (
        shingles(eval_docs, "doc_id", "text", n)
        .select(h60(F.col("shingle")).alias("shash"))
        .distinct()
    )


# moved to ext.dedup (shared with the streaming incremental-dedup path)
_shingle_hash_array = shingle_hash_array


def curate_stream(
    docs: DataFrame,
    eval_hashes: "list[int] | DataFrame",
    ts_col: str = "ts",
    min_quality: float = 0.5,
    watermark: str = "10 minutes",
    shingle_n: int = 8,
) -> DataFrame:
    """Quality-filter → PII-redact → decontaminate → watermark-bounded
    exact dedup. ``docs`` needs (doc_id, ts, text, lang, source);
    returns kept documents with ``quality`` and ``redacted`` columns.

    Order matters: the contamination check runs on the ORIGINAL text
    (redaction must not mask eval overlap), while dedup keys on the
    normalized REDACTED text (two docs differing only in a redacted
    email are the same training document).

    ``eval_hashes`` is either a single-column ``shash`` DataFrame (the
    scale path — see eval_shingle_hashes) or a literal hash list. The
    DataFrame form never touches the driver: on a BATCH frame it
    decontaminates by explode → broadcast semi-join → anti-join; on a
    STREAM it folds the suite to a one-row array via a distributed
    collect_set agg and runs a stream-static LEFT ANTI join (static
    right side — stateless, no streaming state) with arrays_overlap as
    the join condition, re-evaluated from the static table each
    micro-batch. Semantics are identical across all three forms (any
    overlapping n-gram hash marks the document contaminated); the
    parity test pins stream ≡ batch on the DataFrame form.

    Un-scoreable documents (no ``[a-z0-9]`` tokens — CJK, punctuation-only,
    empty — where add_text_stats leaves quality NULL) gate as quality 0.0:
    kept only when the caller sets ``min_quality <= 0``. Without the
    coalesce a NULL quality was dropped by the comparison even at
    min_quality=0, silently and unconditionally.
    """
    scored = add_text_stats(docs).filter(
        F.coalesce(F.col("quality"), F.lit(0.0)) >= min_quality
    )
    red = redact_pii(scored)
    sh_arr = _shingle_hash_array(F.col("text"), shingle_n)
    if isinstance(eval_hashes, DataFrame):
        if docs.isStreaming:
            # stream-static LEFT ANTI join: the static side folds to a
            # one-row array (collect_set agg — distributed, broadcast of
            # one bounded row) and arrays_overlap is the join condition,
            # so a doc is dropped iff any of its shingle hashes appears
            # in the suite. Stateless (static right side) and collect-
            # free; an empty suite still yields one row with an empty
            # array, which overlaps nothing and keeps every doc.
            ev_row = (
                eval_hashes.select("shash")
                .distinct()
                .agg(F.collect_set("shash").alias("_ev_hashes"))
            )
            clean = red.join(
                F.broadcast(ev_row),
                F.arrays_overlap(sh_arr, F.col("_ev_hashes")),
                "left_anti",
            )
        else:
            exploded = red.select(
                "doc_id", F.explode(sh_arr).alias("shash")
            )
            contaminated = (
                exploded.join(F.broadcast(eval_hashes), "shash", "left_semi")
                .select("doc_id")
                .distinct()
            )
            # no forced broadcast: the contaminated doc-id set scales with
            # corpus size × contamination rate (an eval-heavy corpus makes
            # it corpus-sized), unlike the structurally bounded eval-hash
            # set above — statistics/AQE size the anti join, matching the
            # batch pipeline's form (catalog_ext curation)
            clean = red.join(contaminated, "doc_id", "left_anti")
    else:
        ev = F.lit(eval_hashes).cast("array<bigint>")
        # coalesce: a NULL shingle array (NULL text — reachable at
        # min_quality <= 0) has no overlap and must be KEPT, matching
        # both DataFrame forms (explode of NULL emits no rows; the
        # anti join keeps rows whose condition is NULL). Without it the
        # three-valued filter silently dropped those docs on this path.
        clean = red.filter(
            F.coalesce(~F.arrays_overlap(sh_arr, ev), F.lit(True))
        )
    keyed = clean.withColumn("text_key", h60(normalize_text(F.col("redacted"))))
    if keyed.isStreaming:
        # keep-first by ARRIVAL within the watermark horizon.
        # dropDuplicatesWithinWatermark (Spark >= 3.5) is the only form
        # that actually EVICTS per-key state once the watermark passes;
        # plain dropDuplicates(subset) without the event-time column in
        # the subset keeps state forever (dedup-over-all-history) and
        # OOMs a 100 TB stream. Semantics: duplicates whose event times
        # fall within the watermark delay of each other are dropped;
        # a key recurring after the horizon is admitted again — which is
        # the bounded-state behavior the docstring promises.
        deduped = keyed.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(["text_key"])
    else:
        # batch embodiment keeps the deterministic first: earliest event
        # time, doc_id tiebreak (equal to the stream whenever arrival
        # order follows event time — the parity test's case)
        from pyspark.sql import Window

        w = Window.partitionBy("text_key").orderBy(ts_col, "doc_id")
        deduped = (
            keyed.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
    return deduped.select(
        "doc_id", ts_col, "lang", "source", "quality", "redacted"
    )
