"""Text analysis operators for training-data pipelines (north-star §2.J).

All pure Catalyst: language ID (stopword + script heuristic), quality
scoring (length/punct/stopword ratios), token counting (regex families),
and document fingerprinting (min-hash of the token set). At 100 TB these
are embarrassingly parallel map-side expressions — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkwrangle.ext.hashing import h60

WORD_RE = "[a-z0-9]+"
# BPE-ish token families: words, numbers, punctuation runs
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# Tiny per-language stopword lists — a deterministic n-gram-free heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "with", "for"],
    "de": ["der", "die", "das", "und", "von", "zu", "mit", "ist", "ein", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "des"],
}


def tokenize(col: Column | str) -> Column:
    """Lowercase word tokens as an array column."""
    return F.regexp_extract_all(F.lower(col), F.lit(WORD_RE), 0)


def token_count(col: Column | str, pattern: str = BPE_RE) -> Column:
    """Token count under a BPE-ish regex tokenizer (words / numbers /
    punctuation marks) — the cheap proxy for LLM token budgeting."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), 0))


def _stopword_hits(tokens: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword statistics + a quality score.

    Quality = penalize too-short docs, high punctuation density, and a
    token stream with no common-word structure (word-salad detector).

    INVARIANT (load-bearing, test-pinned): ``quality`` is ALWAYS a
    number in [0, 1] — never NULL and never NaN, for every input
    including empty, whitespace-only, and NULL text. Why: ``F.least``
    SKIPS null operands (it does not propagate them), so a NULL ratio
    clamps its term to the bound instead of nulling the sum; no 0/0
    reaches the formula (both ratios are NULL-guarded on their
    denominators); and the one negative excursion — ``size(null)`` = -1
    under non-ANSI sessions makes the length term -0.004 for NULL text —
    is always dominated by the stopword term's clamped +0.3 in that same
    branch (measured: NULL text scores 0.296, empty text 0.3).
    x_quality_prune / the curation pipeline rely on this to use
    ``floor(quality * 32)`` as a zero-job ``order_block`` for
    ``grouped_percent_rank`` — a value outside [0, 1] or NaN there would
    silently MIS-RANK (floor(NaN) lands in the wrong block while NaN
    sorts last). If this formula changes — in particular if ``F.least``
    is replaced by an arithmetic clamp that PROPAGATES nulls — re-check
    those order_block call sites and tests/test_ext.py's invariant test.
    """
    t = F.col(text_col)
    tokens = tokenize(t)
    n_chars = F.length(t)
    n_tokens = F.size(tokens)
    n_punct = F.size(F.regexp_extract_all(t, F.lit("[^a-zA-Z0-9\\s]"), 0))
    avg_word_len = F.when(
        n_tokens > 0,
        F.aggregate(tokens, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
        / n_tokens,
    )
    stop_hits = _stopword_hits(tokens, STOPWORDS["en"])
    stop_ratio = F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars)
    quality = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("avg_word_len", avg_word_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality", quality)
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic language ID: mostly-NON-ASCII text → 'zh' (an honest
    simplification: the signal is the non-ASCII character ratio, not a
    CJK codepoint check, so Cyrillic/Greek/Arabic-heavy text also lands
    in the 'zh' bucket — distinguishing scripts needs per-range codepoint
    classes this n-gram heuristic deliberately omits); otherwise the
    latin language whose stopword list hits most (ties break by fixed
    language order en→de→es→fr; no hit at all → 'und')."""
    t = F.col(text_col)
    tokens = tokenize(t)
    ascii_chars = F.length(F.regexp_replace(t, "[^ -~]", ""))
    non_ascii_ratio = F.when(
        F.length(t) > 0, 1.0 - ascii_chars.cast("double") / F.length(t)
    ).otherwise(F.lit(0.0))
    hits = {lang: _stopword_hits(tokens, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*[hits[k] for k in STOPWORDS])
    # branch order matters: script check first (a CJK doc has zero latin
    # stopword hits), then the no-signal fallback, then the argmax
    pred = F.when(non_ascii_ratio > 0.5, F.lit("zh")).when(best == 0, F.lit("und"))
    for lang in STOPWORDS:  # insertion order = tie priority
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return df.withColumn("lang_pred", pred)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: min portable-hash over the token array — a
    1-perm MinHash, stable under token reordering-free edits."""
    tokens = tokenize(col)
    return F.array_min(F.transform(tokens, lambda tok: h60(tok)))


# accent-folding map shared with the DuckDB oracle (identical translate
# arguments on both sides keep the hash gate exact)
ACCENT_SRC = "àáâäãåèéêëìíîïòóôöõùúûüýñçÀÁÂÄÃÅÈÉÊËÌÍÎÏÒÓÔÖÕÙÚÛÜÝÑÇ"
ACCENT_DST = "aaaaaaeeeeiiiiooooouuuuyncAAAAAAEEEEIIIIOOOOOUUUUYNC"


def normalize_for_dedup(col: Column | str) -> Column:
    """Canonical text form for cross-source dedup: accent folding →
    lowercase → strip punctuation → collapse whitespace. Pure built-ins
    (translate + regexp), so it runs map-side at corpus scale."""
    folded = F.translate(F.col(col) if isinstance(col, str) else col, ACCENT_SRC, ACCENT_DST)
    cleaned = F.regexp_replace(F.regexp_replace(F.lower(folded), "[^a-z0-9 ]", " "), " +", " ")
    return F.trim(cleaned)


# PII-shaped patterns, identical semantics under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS = {
    "email": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "url": "https?://[^ \\t\\n]+",
    "phone": "\\+?[0-9][0-9() -]{7,}[0-9]",
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact email/URL/phone-shaped spans with ``[TYPE]`` placeholders and
    count each redaction type. A chained regexp_replace — map-side only,
    order fixed (urls before phones so a URL's digits never half-match the
    phone pattern after partial rewriting).
    """
    t = F.col(text_col)
    counts = {
        f"n_{k}": F.size(F.regexp_extract_all(t, F.lit(p), 0))
        for k, p in PII_PATTERNS.items()
    }
    red = t
    for k in ("email", "url", "phone"):
        red = F.regexp_replace(red, PII_PATTERNS[k], f"[{k.upper()}]")
    return df.withColumns({**counts, "redacted": red})


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of each document for a bag-of-terms query.

    Per-term tf is an array-filter count on the token array (map-side, no
    explode); corpus stats (N, avgdl, per-term df) collapse to ONE scalar
    row that broadcasts back; the score is a FIXED-order sum of per-term
    contributions, so no float aggregation order can differ across
    engines or partitionings. Adds a raw ``bm25`` column (caller rounds).

    Zero-token documents (empty/punctuation-only text) are EXCLUDED from
    the output, not scored 0 — they also do not count toward N or avgdl
    (a 0-length dl would otherwise skew the length normalization); join
    scores back to the corpus by id if full coverage is needed.
    """
    t = tokenize(F.col(text_col))
    dls = df.withColumn("_t", t).filter(F.size("_t") > 0).withColumn(
        "_dl", F.size("_t").cast("double")
    )

    def _tf(trm):
        # exactly one lambda parameter: F.filter passes (element, index)
        # to two-parameter callables, silently binding a default arg
        return F.size(F.filter(F.col("_t"), lambda x: x == trm)).cast("double")

    stats = dls.agg(
        F.count("*").cast("double").alias("_n_corpus"),
        F.avg("_dl").alias("_avgdl"),
        *[F.sum((_tf(trm) > 0).cast("bigint")).cast("double").alias(f"_df_{i}")
          for i, trm in enumerate(terms)],
    )
    scored = dls.crossJoin(F.broadcast(stats))
    total = F.lit(0.0)
    for i, trm in enumerate(terms):
        tf = _tf(trm)
        idf = F.log(
            (F.col("_n_corpus") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5)
            + 1.0
        )
        part = idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        )
        contrib = F.when(tf > 0, part).otherwise(F.lit(0.0))
        total = contrib if i == 0 else total + contrib
    drop = ["_t", "_dl", "_n_corpus", "_avgdl"] + [f"_df_{i}" for i in range(len(terms))]
    return scored.withColumn("bm25", total).drop(*drop)


def prune_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 4,
    min_occ: int = 3,
    count_mode: str = "window",
) -> DataFrame:
    """C4/RefinedWeb-style boilerplate span removal: split each document
    into aligned ``block``-token blocks, count corpus-wide occurrences of
    each block (by portable hash), drop blocks occurring ``min_occ``+
    times, reassemble survivors in order. Docs losing every block drop
    out.

    ``count_mode`` picks how the corpus-wide block count is computed —
    the same dial (and the same caveat) as ``duplicate_spans``:

    * ``"window"`` (default): ``count(*) OVER (PARTITION BY block_hash)``
      — one scan, one shuffle; fastest locally. Caveat: a boilerplate
      block shared by 10⁹ documents (a common footer on a web crawl) is
      a single straggler task, and window shuffles are invisible to AQE
      skew splitting — and hot blocks are exactly what this operator
      hunts, so flip the mode when the corpus is known to carry
      high-multiplicity boilerplate.
    * ``"join"`` (skew-safe scale form): map-side-combinable
      ``groupBy(block_hash).count()`` (shuffle volume = distinct blocks
      per map partition, not all block instances) joined back onto the
      block stream — AQE-skew-splittable, broadcast-upgradable when the
      count table is small. Costs a second evaluation of the
      tokenize/explode subtree. Output pinned equal to the window form
      by test.

    Returns (id_col, n_blocks, n_dropped, cleaned_text).
    """
    from pyspark.sql import Window

    if count_mode not in ("window", "join"):
        raise ValueError(
            f"prune_boilerplate: count_mode must be 'window' or 'join', "
            f"got {count_mode!r}"
        )
    toks = df.select(id_col, tokenize(F.col(text_col)).alias("t")).filter(
        F.size("t") > 0
    )
    blocks = toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 1, F.lit(block)),
                lambda s: F.struct(
                    s.alias("s"),
                    F.concat_ws(" ", F.slice(F.col("t"), s + 1, F.lit(block))).alias("bt"),
                ),
            )
        ).alias("b"),
    ).select(id_col, "b.s", "b.bt", h60(F.col("b.bt")).alias("_bh"))
    if count_mode == "join":
        occs = blocks.groupBy("_bh").agg(F.count("*").alias("occ"))
        counted = blocks.join(occs, "_bh").drop("_bh")
    else:
        occ = F.count("*").over(Window.partitionBy("_bh"))
        counted = blocks.withColumn("occ", occ).drop("_bh")
    dropped = F.sum((F.col("occ") >= min_occ).cast("bigint"))
    kept = F.array_sort(
        F.collect_list(F.when(F.col("occ") < min_occ, F.struct("s", "bt")))
    )
    return (
        counted.groupBy(id_col)
        .agg(
            F.count("*").alias("n_blocks"),
            dropped.alias("n_dropped"),
            F.concat_ws(" ", F.transform(kept, lambda x: x.bt)).alias("cleaned_text"),
        )
        .filter(F.col("n_blocks") > F.col("n_dropped"))
    )


def bpe_train(
    docs: DataFrame, text_col: str = "text", rounds: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Canonical iterative BPE training (Sennrich et al. 2016), first
    ``rounds`` merges: count corpus-weighted adjacent symbol pairs over
    the VOCABULARY (tiny — the corpus is touched once for word counts),
    take the argmax pair (count desc, pair asc tiebreak), apply the merge
    greedily leftmost within every word, repeat. Returns one row per
    merge: (merge_rank, left_sym, right_sym, pair_count).

    Greedy-leftmost on overlapping matches is the canonical subtlety
    ('a a a' under merge (a,a) → 'aa a', not 'a aa'): match positions are
    grouped into runs of consecutive positions (gaps-and-islands) and
    only ODD ranks within a run merge — the relational form of the
    sequential left-to-right scan, no UDF.

    Every per-round window and the rebuild groupBy share the word
    partition key, so each round is one vocabulary-sized exchange plus
    a broadcast of the single best-pair row. The pair-count argmax runs
    over the aggregated pair table (bounded by vocabulary size).

    Per round, the single best pair is COLLECTED (one bounded row — a
    training artifact, same contract as collect_codebooks) and re-injected
    as literals, and the rebuilt symbol table is localCheckpoint'ed: both
    break the otherwise O(rounds²) recursive lineage where round r's
    argmax would re-derive every earlier round's rebuild. At scale the
    symbol table is vocabulary-bounded, so the per-round checkpoint is a
    vocabulary-sized write, never a corpus-sized one.
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    words = docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
    vocab = words.groupBy("w").agg(F.count("*").alias("tf"))
    v = vocab.select(
        "w",
        "tf",
        F.expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))").alias(
            "syms"
        ),
    ).localCheckpoint()
    wd = Window.partitionBy("w").orderBy("pos")
    merges = []
    for rank in range(1, rounds + 1):
        e = v.select("w", "tf", F.posexplode("syms").alias("pos", "sym"))
        pr = e.withColumn("nxt", F.lead("sym").over(wd))
        pc = (
            pr.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("sym").alias("l"), F.col("nxt").alias("rr"))
            .agg(F.sum("tf").cast("bigint").alias("n"))
        )
        top = pc.orderBy(F.desc("n"), F.asc("l"), F.asc("rr")).limit(1).collect()
        if not top:
            break
        bl, br, n = top[0]["l"], top[0]["rr"], top[0]["n"]
        merges.append((rank, bl, br, n))
        # apply greedy-leftmost: runs of consecutive match positions keep
        # odd ranks. All windows share the hash(w) clustering (the extra
        # partition keys only subdivide w groups), so after pr's one sort
        # no further exchange is inserted.
        match = F.coalesce(
            (F.col("sym") == F.lit(bl)) & (F.col("nxt") == F.lit(br)), F.lit(False)
        )
        d = pr.withColumn("match", match).withColumn(
            "mrn",
            F.row_number().over(Window.partitionBy("w", "match").orderBy("pos")),
        )
        d = d.withColumn(
            "krn",
            F.row_number().over(
                Window.partitionBy("w", "match", F.col("pos") - F.col("mrn")).orderBy(
                    "pos"
                )
            ),
        )
        d = d.withColumn(
            "kept", F.col("match") & (F.col("krn") % 2 == 1)
        ).withColumn("swallowed", F.lag("kept", 1, False).over(wd))
        rb = d.filter(~F.col("swallowed")).select(
            "w",
            "tf",
            "pos",
            F.when(F.col("kept"), F.concat(F.col("sym"), F.col("nxt")))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
        v = rb.groupBy("w", "tf").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sym"))), lambda s: s.sym
            ).alias("syms")
        ).localCheckpoint()
    merges_df = spark.createDataFrame(
        [(r, l, rt, int(n)) for r, l, rt, n in merges],
        "merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )
    return merges_df, v


def bpe_train_merges(
    docs: DataFrame, text_col: str = "text", rounds: int = 3
) -> DataFrame:
    """The merge table alone — see ``bpe_train`` (which also returns the
    final word → symbol-sequence table for segmentation)."""
    return bpe_train(docs, text_col, rounds)[0]


def bpe_segment_counts(
    docs: DataFrame, text_col: str = "text", rounds: int = 3
) -> DataFrame:
    """APPLY the trained merges: per-document BPE token counts from the
    trained word → symbols table (the tokenizer's encode step, corpus
    side). Per doc: whitespace token count, BPE symbol count after
    ``rounds`` merges, and chars-per-BPE-token — the compression metric a
    tokenizer budget decision reads. The vocabulary join is
    statistics/AQE-sized, NOT force-broadcast: the word vocabulary is
    corpus-scaling (Heaps' law — billions of distinct tokens on a
    web-scale corpus), the same reason the unigram-NLL vocab join is
    unhinted. Per-word symbol counts come map-side from the trained
    table, so the corpus is scanned once."""
    _, v = bpe_train(docs, text_col, rounds)
    words = docs.select(
        "doc_id", F.explode(tokenize(F.col(text_col))).alias("w")
    )
    seg = words.join(
        v.select("w", F.size("syms").alias("nsym"), F.length("w").alias("nchr")),
        "w",
    )
    return seg.groupBy("doc_id").agg(
        F.count("*").alias("n_ws_tokens"),
        F.sum("nsym").cast("bigint").alias("n_bpe_tokens"),
        F.round(
            F.sum("nchr").cast("double") / F.sum("nsym").cast("double"), 6
        ).alias("chars_per_bpe_token"),
    )
