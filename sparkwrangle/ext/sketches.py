"""Distributed probabilistic sketches: Count-Min and HyperLogLog.

The 100 TB rationale: both sketches reduce an arbitrarily large input to a
CONSTANT-size summary (depth×width counters / m registers) via a single
map-side-combinable aggregation — the canonical way to get heavy hitters
and distinct counts out of a corpus that cannot be grouped exactly. Spark
ships an opaque HLL (``approx_count_distinct``); these are the white-box
relational forms whose every intermediate is a table, so the DuckDB oracle
can replay them bit-for-bit (portable md5-derived h60 hashing, exact int64
universal-hash mixing — ext/hashing.py).

Cormode & Muthukrishnan (J. Algorithms 2005) for CMS; Flajolet et al.
(AofA 2007) for HLL. No counterpart in the reference (its pandas engine
holds everything in memory); north-star §2.J scale-analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkwrangle.ext.hashing import (
    h60,
    h60_sql,
    minhash_coeffs,
    universal_hash,
    universal_hash_sql,
)

# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def cms_buckets(item: Column, depth: int, width: int, seed: int = 7) -> Column:
    """Array of ``depth`` bucket ids for one item (row d uses hash_d)."""
    h = h60(item)
    return F.array(
        *[universal_hash(h, a, b) % width for a, b in minhash_coeffs(depth, seed)]
    )


def cms_sketch(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256, seed: int = 7
) -> DataFrame:
    """Build the (d, bucket, cnt) counter table — ONE map-side-combinable
    aggregation over depth×|input| tiny rows; output is ≤ depth·width rows
    regardless of input size (the whole point at 100 TB)."""
    return (
        df.select(
            F.posexplode(cms_buckets(F.col(item_col), depth, width, seed)).alias(
                "d", "bucket"
            )
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _row_preserving_probe(df: DataFrame, build_est) -> DataFrame:
    """Shared probe shape for cms_estimates / bloom_probe: tag every input
    row with an internal id, hand ``build_est`` a SLIM (_rid + probe
    expressions) frame to aggregate one estimate row per _rid, and join
    the estimates back. Row-preserving (duplicate input rows each keep
    their own estimate), and the probe pipeline never sees the caller's
    other columns — so a probe frame with columns named 'cnt'/'bits'/'d'
    (join-key collisions) or un-groupable types (maps) works, and wide
    rows are never shuffled as grouping keys. ``build_est(ridded)`` must
    return (_rid, <estimate col>) with exactly one row per _rid."""
    if "_rid" in df.columns:
        raise ValueError("probe input must not contain a reserved '_rid' column")
    ridded = df.withColumn("_rid", F.monotonically_increasing_id())
    return ridded.join(build_est(ridded), "_rid").drop("_rid")


def cms_estimates(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 7,
) -> DataFrame:
    """Point-query the sketch for each row of ``items``: est = min over
    rows d of counter[d][bucket_d(item)]. CMS guarantees est ≥ true count.
    The sketch side is ≤ depth·width rows → broadcast join; only the slim
    (_rid, d, bucket) stream is shuffled for the per-row min."""

    def est(ridded):
        probes = ridded.select(
            "_rid",
            F.posexplode(cms_buckets(F.col(item_col), depth, width, seed)).alias(
                "d", "bucket"
            ),
        )
        # LEFT join + coalesce(cnt, 0): an item whose (d, bucket) rows are
        # all absent from the sketch was never inserted — CMS point-query
        # semantics say it estimates ~0, not "silently dropped".
        return (
            probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
            .groupBy("_rid")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
        )

    return _row_preserving_probe(items, est)


def cms_sketch_sql(
    src: str, item_expr: str, depth: int = 4, width: int = 256, seed: int = 7
) -> str:
    """DuckDB twin of cms_sketch as a CTE body (yields d, bucket, cnt)."""
    h = h60_sql(item_expr)
    arms = "\n        UNION ALL ".join(
        f"SELECT {d} AS d, ({universal_hash_sql('h', a, b)}) % {width} AS bucket "
        f"FROM hsrc"
        for d, (a, b) in enumerate(minhash_coeffs(depth, seed))
    )
    return (
        f"hsrc AS (SELECT {h} AS h FROM {src}),\n"
        f"    allb AS ({arms}),\n"
        f"    sketch AS (SELECT d, bucket, count(*) AS cnt FROM allb GROUP BY d, bucket)"
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_M = 256  # 2^8 registers
# alpha_m for m >= 128 (Flajolet et al. §4) — computed once in Python and
# inlined as the SAME literal on both engines.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_rho(h: Column) -> Column:
    """Position of the leftmost 1-bit (1-based) in the 52 bits that remain
    after the 8 register-index bits: integer/string ops only (length of the
    minimal binary representation — identical in Spark and DuckDB), no
    float log2 anywhere."""
    rem = F.shiftright(h, 8)
    return F.when(rem == 0, F.lit(53)).otherwise(53 - F.length(F.bin(rem)))


def hll_registers(df: DataFrame, item_col: str, keys: list[str] | None = None) -> DataFrame:
    """(keys..., reg, mx): per-register max leading-1 position — a
    map-side-combinable MAX, ≤ m rows per key group.

    NULL items are dropped up front (standard count-distinct semantics):
    without the filter a NULL hashes to a phantom (reg=NULL, mx=NULL) row
    that inflates ``present`` in hll_estimate while adding nothing to the
    harmonic sum."""
    base = df.filter(F.col(item_col).isNotNull())
    h = h60(F.col(item_col))
    base = base.select(*(keys or []), (h % HLL_M).alias("reg"), hll_rho(h).alias("rho"))
    return base.groupBy(*(keys or []), "reg").agg(F.max("rho").alias("mx"))


def hll_estimate(registers: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Harmonic-mean estimate with the small-range correction
    (E ≤ 2.5m and empty registers → linear counting m·ln(m/V)).
    Empty registers contribute 2⁰ = 1 to the harmonic sum.

    The harmonic sum Σ2^−Mj is accumulated as the INTEGER Σ2^(53−Mj)
    (max 256·2^52 < 2^61, exact in int64) and divided by 2^53 once —
    bitwise order-invariant under any partitioning, where a float sum
    of mixed-magnitude powers of two is not."""
    keys = keys or []
    m = F.lit(HLL_M)
    # coalesce: SUM over zero register rows (empty/all-NULL-item input on
    # the ungrouped path) is NULL; present=0 then routes raw ≈ α·m ≤ 2.5m
    # with v=m>0 into linear counting m·ln(m/m) = 0.0 — the correct
    # distinct count for empty input, instead of a NULL that every caller
    # would have to patch (tools/profile_table.py used to)
    agg = registers.groupBy(*keys).agg(
        F.count("*").alias("present"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), 53 - F.col("mx")).cast("bigint")), F.lit(0)
        ).alias("sum_i"),
    )
    v = m - F.col("present")
    sum_present = F.col("sum_i").cast("double") / F.lit(float(2**53))
    raw = F.lit(HLL_ALPHA) * m * m / (sum_present + v.cast("double"))
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0), m.cast("double") * F.log(m / v.cast("double"))
    ).otherwise(raw)
    return agg.select(*keys, v.alias("v_empty"), est.alias("hll_raw"))


def hll_sql(src: str, item_expr: str, keys: str = "") -> str:
    """DuckDB twin as CTE bodies (yields keys..., v_empty, hll_raw).

    Mirrors hll_registers' NULL-item filter (WHERE item IS NOT NULL) and
    hll_estimate's empty-input coalesce — without them a NULL item makes
    a phantom (reg NULL, mx NULL) register row that inflates ``present``
    on THIS engine only, breaking the parity this module exists for."""
    h = h60_sql(item_expr)
    ksel = f"{keys}, " if keys else ""
    kgrp = f"GROUP BY {keys}" if keys else ""
    kgrp_reg = f"GROUP BY {ksel}reg" if keys else "GROUP BY reg"
    return f"""hsrc AS (SELECT {ksel}{h} AS h FROM {src}
              WHERE ({item_expr}) IS NOT NULL),
    rho AS (SELECT {ksel}h % {HLL_M} AS reg,
                   CASE WHEN (h >> 8) = 0 THEN 53
                        ELSE 53 - length(bin(h >> 8)) END AS rho
            FROM hsrc),
    regs AS (SELECT {ksel}reg, max(rho) AS mx FROM rho {kgrp_reg}),
    hagg AS (SELECT {ksel}count(*) AS present,
                    CAST(coalesce(sum(CAST(pow(2.0, 53 - mx) AS BIGINT)), 0)
                         AS DOUBLE)
                    / {float(2**53)!r} AS sum_present
             FROM regs {kgrp}),
    hest AS (SELECT {ksel}{HLL_M} - present AS v_empty,
                    CASE WHEN (CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}
                               / (sum_present + CAST({HLL_M} - present AS DOUBLE)))
                              <= CAST({2.5 * HLL_M} AS DOUBLE)
                          AND ({HLL_M} - present) > 0
                         THEN {HLL_M} * ln({HLL_M} / CAST({HLL_M} - present AS DOUBLE))
                         ELSE CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}
                              / (sum_present + CAST({HLL_M} - present AS DOUBLE))
                    END AS hll_raw
             FROM hagg)"""


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 20  # bits (~10× the sf0.1 eval shingle count → fp ≈ 0.1%;
#                    the packed bitmap is ≤ 32k rows / ~0.5 MB — broadcast-safe)
BLOOM_WORD = 32  # bits packed per bitmap row (1 << 31 stays positive in int64
#                 on both engines; DuckDB overflow-checks 1 << 63)
BLOOM_K = 3  # hash functions


def _bloom_positions(h: Column, seed: int = 7) -> list[Column]:
    return [
        universal_hash(h, a, b) % BLOOM_M
        for a, b in minhash_coeffs(BLOOM_K, seed)
    ]


def _word_bit() -> tuple[Column, Column]:
    """(word_idx, bit) expressions over an exploded position column ``p``
    — ONE definition shared by bloom_bitmap and bloom_probe, so a future
    WORD-size or packing change cannot apply to the build but miss the
    probe (or vice versa)."""
    word = F.floor(F.col("p") / BLOOM_WORD).cast("bigint")
    # SQL-form shiftleft: the Python API wants a literal shift count
    bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD} AS INT))")
    return word, bit


def bloom_bitmap(df: DataFrame, hash_col: str, seed: int = 7) -> DataFrame:
    """(word_idx, bits): BLOOM_M-bit Bloom filter over the int64 hash
    column, packed BLOOM_WORD bits per row — ≤ m/WORD rows total from any
    input size, built by ONE map-side-combinable bit_or aggregation. The
    constant-size membership summary that replaces broadcasting an exact
    key set when the set itself is too big to ship."""
    pos = F.explode(F.array(*_bloom_positions(F.col(hash_col), seed))).alias("p")
    exploded = df.select(pos)
    word, bit = _word_bit()
    return (
        exploded.select(word.alias("word_idx"), bit.alias("b"))
        .groupBy("word_idx")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_probe(
    df: DataFrame, hash_col: str, bitmap: DataFrame, seed: int = 7
) -> DataFrame:
    """Adds ``bloom_hit``: true iff ALL k bit positions of hash_col are set
    in the (broadcast) bitmap. Bloom guarantee: every true member hits
    (no false negatives); non-members hit with p ≈ (1−e^{−kn/m})^k.
    The probe is k narrow lookups against ≤ m/WORD broadcast rows — no
    shuffle of the probe side.

    Row-preserving via the shared ``_row_preserving_probe`` shape:
    duplicate probe rows each get their own bloom_hit, and only the slim
    (_rid, word, bit) stream ever reaches the join/regroup."""

    def est(ridded):
        probes = ridded.select(
            "_rid",
            F.explode(F.array(*_bloom_positions(F.col(hash_col), seed))).alias("p"),
        )
        word, bit = _word_bit()
        hit = (
            probes.select("_rid", word.alias("word_idx"), bit.alias("b"))
            .join(F.broadcast(bitmap), "word_idx", "left")
            .select(
                "_rid",
                (
                    (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("b"))) != 0
                ).alias("_set"),
            )
        )
        # bool_and, not sum(_set)==K: a duplicated probe row contributes
        # each position multiple times, which would turn the row-count-
        # dependent sum into a false NEGATIVE — violating the Bloom
        # guarantee. AND over the per-position hits is duplicate-insensitive.
        return hit.groupBy("_rid").agg(F.bool_and("_set").alias("bloom_hit"))

    return _row_preserving_probe(df, est)


def bloom_bitmap_sql(src: str, hash_expr: str, seed: int = 7) -> str:
    """DuckDB twin as a CTE body (yields word_idx, bits)."""
    arms = "\n        UNION ALL ".join(
        f"SELECT ({universal_hash_sql(hash_expr, a, b)}) % {BLOOM_M} AS p FROM {src}"
        for a, b in minhash_coeffs(BLOOM_K, seed)
    )
    return (
        f"bpos AS ({arms}),\n"
        f"    bmap AS (SELECT p // {BLOOM_WORD} AS word_idx,\n"
        f"                    bit_or(CAST(1 AS BIGINT) << CAST(p % {BLOOM_WORD} AS INT)) AS bits\n"
        f"             FROM bpos GROUP BY p // {BLOOM_WORD})"
    )


# ---------------------------------------------------------------------------
# Equi-width histogram quantiles
# ---------------------------------------------------------------------------

HIST_BINS = 256


def histogram_quantiles(
    df: DataFrame, value_col: str, ps: list[float], keys: list[str] | None = None
) -> DataFrame:
    """Quantile estimates from a fixed 256-bin equi-width histogram —
    the one-pass, constant-state alternative to an exact sort when the
    input can't be globally ordered: bounds + bin counts are two
    map-side-combinable aggregations; the estimate linearly interpolates
    inside the first bin whose cumulative count reaches p·n. Returns
    (keys..., p, est) per requested quantile. Bin membership and
    interpolation are the same IEEE expressions on both engines.

    ``keys`` gives the GROUPED form (per-key bounds, bins, and
    estimates — ≤ 256 bins of state per key); parallelism scales with
    key count and the cumulative window partitions by key. Keyed joins
    against the per-key stats table are NULL-SAFE (a NULL grouping key
    forms its own group, like any GROUP BY, instead of being silently
    dropped by an equality join) and unhinted — st has one row per key,
    which is NOT structurally bounded at the key cardinalities this
    grouped form exists for, so statistics/AQE size it; only the
    ungrouped path's 1-row stats frame keeps a forced broadcast."""
    from pyspark.sql import Window

    keys = keys or []
    # NaN must go with the NULLs: Spark orders NaN above all doubles, so a
    # single NaN makes max(v) = NaN, poisoning the bin ratio for EVERY row
    # (floor(NaN*256) lands all rows in bin 0 with NaN estimates, silently)
    v = df.select(*keys, F.col(value_col).cast("double").alias("v")).filter(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    st = v.groupBy(*keys).agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count("*").alias("n"),
    )
    # st's key columns are renamed so the null-safe join condition can
    # reference both sides unambiguously; dropped right after each join
    sta = st.select(
        *[F.col(k).alias(f"_hq_{k}") for k in keys], "mn", "mx", "n"
    )
    _renamed = [f"_hq_{k}" for k in keys]

    def _stats_join(left):
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"_hq_{k}"))
            cond = c if cond is None else cond & c
        return left.join(sta, cond).drop(*_renamed)

    joined = _stats_join(v) if keys else v.crossJoin(F.broadcast(st))
    ratio = F.when(
        F.col("mx") > F.col("mn"),
        (F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn")),
    ).otherwise(F.lit(0.0))
    b = joined.select(
        *keys,
        F.least(F.floor(ratio * HIST_BINS), F.lit(HIST_BINS - 1))
        .cast("bigint")
        .alias("bin"),
    )
    hist = b.groupBy(*keys, "bin").agg(F.count("*").alias("cnt"))
    wc = (
        Window.partitionBy(*keys).orderBy("bin") if keys else Window.orderBy("bin")
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(wc))
    # provably bounded (len(ps) rows) → forced broadcast, or the
    # ps × cumulative-histogram attach plans as a CartesianProduct (the
    # non-equi cum >= p·n condition leaves no equi keys and the planner
    # was not broadcasting the tiny side; guide §3.1 — hint when you
    # know a side is small)
    pdf = F.broadcast(
        df.sparkSession.createDataFrame([(float(p),) for p in ps], "p double")
    )
    cand = (
        pdf.crossJoin(_stats_join(cum) if keys else cum.crossJoin(F.broadcast(st)))
        .filter(F.col("cum") >= F.col("p") * F.col("n"))
    )
    pick = cand.groupBy(*keys, "p").agg(
        F.min(F.struct("bin", "cnt", "cum", "mn", "mx", "n")).alias("s")
    )
    s = F.col("s")
    frac = (s["n"] * F.col("p") - (s["cum"] - s["cnt"])) / s["cnt"]
    est = s["mn"] + (s["bin"] + frac) * (s["mx"] - s["mn"]) / HIST_BINS
    return pick.select(*keys, "p", est.alias("est"))
