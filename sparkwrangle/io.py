"""Table registry and parquet IO.

The engine's data model is long/narrow DataFrames with declared schemas
(SURVEY.md §1.3): no pandas-style implicit wide matrices on the hot path.
``load_table``/``load_tables`` read the driver's TPC-H-ish testdata
(TESTDATA.md); ``write_table`` persists partitioned parquet the way a
100 TB ingest would (date/block partition columns, no coalesce(1)).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

# Tables the driver generates per TESTDATA.md / FIXTURES.md §B.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins.
DIMENSION_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Per-session memo of loaded tables: DataFrames are immutable, so handing
# back the same (lazy) plan skips the per-call parquet file listing and
# footer/schema read — ~0.1-0.2 s each, which dominates sub-second queries.
# Keyed weakly by session so a stopped session's plans can never leak into
# a new one.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet → full pushdown/pruning support.

    ``events.ts`` has shipped both as INT64 TIMESTAMP(NANOS) (which Spark
    cannot read as a timestamp; ``spark.sql.legacy.parquet.nanosAsLong``
    reads raw nanos and we floor to microseconds) and as plain
    timestamp[us] (later testdata generations). We sniff the read dtype
    and only convert when nanos arrived as LongType. DuckDB's
    ``CAST(ts_ns AS TIMESTAMP)`` floors identically for positive epochs,
    so oracle comparisons stay exact either way. Sub-microsecond ordering
    ties are impossible in this data (events are seconds apart).
    """
    try:
        per_session = _TABLE_CACHE.setdefault(spark, {})
    except TypeError:  # un-weakref-able session stub (tests/mocks)
        per_session = {}
    key = (os.path.abspath(sf_dir), name)
    if key in per_session:
        return per_session[key]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _lift_ts_col(df, "ts")
    per_session[key] = df
    return df


def _lift_ts_col(df: DataFrame, col: str) -> DataFrame:
    """Lift one sniffed timestamp column onto the engine's LTZ contract
    (shared by ``load_table`` and ``load_user_parquet`` so the two read
    paths cannot drift): raw nanos longs (read under ``nanosAsLong``)
    floor to microseconds; NTZ casts to the session-TZ timestamp —
    value-identical because session TZ is pinned UTC (session.py) — so
    ``cast(ts as bigint)`` consumers (sessionize, as-of joins) keep
    working."""
    t = df.schema[col].dataType
    if isinstance(t, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if isinstance(t, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table as a temp view for the SQL surface.
    Tables whose parquet file is absent from ``sf_dir`` are skipped —
    partial datasets (a feed-only or star-schema-only directory) still
    get a working SQL surface for the tables they do carry. Returns the
    list of SKIPPED table names (and warns) so a partial-dataset session
    surfaces what is missing up front instead of as a later confusing
    'table or view not found' at query time."""
    import warnings
    from pathlib import Path

    skipped: list[str] = []
    for name in TABLES:
        if (Path(sf_dir) / f"{name}.parquet").exists():
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        else:
            skipped.append(name)
    if skipped:
        warnings.warn(
            f"register_views({sf_dir}): missing parquet for {skipped}; "
            "SQL referencing these tables will fail with 'table not found'",
            stacklevel=2,
        )
    return skipped


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist a table the way the 100 TB ingest jobs would.

    Partition columns (event date, block_id) enable static + dynamic
    partition pruning on read; parquet gives row-group min/max skipping.
    CSV/JSON are supported for interchange but parquet is the engine's
    canonical storage (the reference's xlsx input is ingested once to
    parquet the same way — SURVEY §2.A1).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def _sniff_nanos_cols(path: str) -> list[str] | None:
    """Footer-sniff a user parquet path for TIMESTAMP(NANOS) columns via
    pyarrow. Top-level nanos columns are returned by name (they get the
    raw-long → microsecond lift); nanos NESTED inside struct/list/map
    types can't be lifted column-wise, so their presence demotes the
    answer to None — 'unknown, assume nanos possible', which keeps the
    defensive ``nanosAsLong`` conf exactly like the pre-r12 behavior
    (ADVICE r12: the r12 top-level-only sniff returned [] for
    nested-only files, dropping the conf and crashing the scan the old
    code could read). None is also returned when the sniff itself fails
    (path style pyarrow can't resolve)."""
    try:
        import pyarrow as pa
        import pyarrow.dataset as pads

        def _has_nanos(t) -> bool:
            if pa.types.is_timestamp(t) and t.unit == "ns":
                return True
            if pa.types.is_struct(t):
                return any(_has_nanos(f.type) for f in t)
            if (
                pa.types.is_list(t)
                or pa.types.is_large_list(t)
                or pa.types.is_fixed_size_list(t)
            ):
                return _has_nanos(t.value_type)
            if pa.types.is_map(t):
                return _has_nanos(t.key_type) or _has_nanos(t.item_type)
            return False

        local = path[7:] if path.startswith("file://") else path
        schema = pads.dataset(local, format="parquet").schema
        top = [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
        nested = any(
            _has_nanos(f.type)
            for f in schema
            if not (pa.types.is_timestamp(f.type) and f.type.unit == "ns")
        )
        if nested and not top:
            return None
        return top
    except Exception:
        return None


def load_user_parquet(spark: SparkSession, path: str, ts_cols: tuple = ()):
    """Read USER-supplied parquet defensively (tools/backtest.py inputs).

    pandas ``to_parquet`` writes datetime64[ns] as INT64 TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects outright — and a reference
    user's bars/fx files come straight from pandas. Same sniff-and-floor
    strategy as ``load_table`` (shared ``_lift_ts_col``): read nanos as
    raw longs, floor to microseconds; lift NTZ to the session-TZ
    timestamp contract. Floors are exact for this data (bars are minutes
    apart).

    Conf hygiene (round 12): the pyarrow footer sniff decides up front
    whether the file carries nanos columns at all — a nanos-free file is
    read WITHOUT touching ``spark.sql.legacy.parquet.nanosAsLong``, so
    this path no longer flips session-wide read semantics for users who
    never needed it. When nanos ARE present the conf must stay set for
    the returned (lazy) plan's lifetime — Spark re-reads it at execution,
    so a save-and-restore here would crash the scan later — and EVERY
    sniffed nanos column is lifted (union with ``ts_cols``), closing the
    silent raw-long hole for columns the caller forgot to name."""
    nanos = _sniff_nanos_cols(path)
    lift: tuple | list = ts_cols
    if nanos is None:
        # unknown layout: keep the old defensive behavior verbatim
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    elif nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        lift = list(ts_cols) + [c for c in nanos if c not in ts_cols]
    df = spark.read.parquet(path)
    for c in lift:
        df = _lift_ts_col(df, c)
    return df


def read_any(spark: SparkSession, path: str, fmt: str = "parquet", schema=None):
    """Format-flexible reader for ingest jobs (csv/json/orc/parquet).
    Always pass an explicit schema for text formats — inference scans the
    data twice and guesses types the oracle gate would reject."""
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.load(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write — the co-located-join layout for 100 TB fact
    tables: two tables bucketed (and sorted) on the same join key join
    WITHOUT a shuffle (no Exchange in the plan). Bucketing requires the
    table catalog (saveAsTable), not a bare path."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> tuple[int, int]:
    """Small-files compaction: rewrite a table directory into files sized
    for scan efficiency (~``target_file_mb`` each, ≥1).

    Streaming sinks and fine-grained ingest leave thousands of KB-sized
    files; at 100 TB the resulting open/footer-read overhead dominates
    scans and the NameNode/listing cost grows unbounded. Compaction sizes
    the output from the data's actual on-disk bytes, repartitions by
    round-robin (no key skew), and swaps the rewrite in with two renames
    (old table aside, new table in) so a concurrent reader resolving the
    path sees either the old layout or the new one, never a missing or
    half-written directory.

    Hive-style partition layouts (``key=value`` subdirectories) are
    PRESERVED: the rewrite re-applies ``partitionBy`` on the inferred
    partition columns — flattening them would silently strip partition
    pruning from every downstream reader.

    Returns (files_before, files_after).
    """
    import shutil

    def _data_files(p):
        out = []
        for root, _dirs, files in os.walk(p):
            out += [
                os.path.join(root, f)
                for f in files
                if not f.startswith(("_", "."))
            ]
        return out

    def _partition_cols(p):
        # walk the first directory chain: every level of a hive layout is
        # a single repeated key=value naming scheme
        cols = []
        cur = p
        while True:
            subs = [
                d
                for d in os.listdir(cur)
                if os.path.isdir(os.path.join(cur, d)) and "=" in d
            ]
            if not subs:
                return cols
            cols.append(subs[0].split("=", 1)[0])
            cur = os.path.join(cur, subs[0])

    before = _data_files(path)
    total_mb = sum(os.path.getsize(f) for f in before) / (1024 * 1024)
    n_files = max(1, round(total_mb / target_file_mb))
    pcols = _partition_cols(path)
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    writer = df.repartition(n_files).write.mode("overwrite").format(fmt)
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.save(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(before), len(_data_files(path))
