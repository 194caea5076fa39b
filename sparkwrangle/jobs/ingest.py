"""Ingest jobs (SURVEY §2.A1-A3): external sources → canonical parquet.

The reference reads `Stocks.xlsx` (a sparse 50×24 company-by-exchange
ticker matrix, intra_day_arbitrage.ipynb:188-210) and fetches bars from
Yahoo at run time. The engine ingests ONCE into long-format partitioned
parquet; everything downstream is `spark.read.parquet`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# exchange columns of the reference workbook, in sheet order (cells 11-13)
US_EXCHANGES = ["NMS", "NMS2", "NYQ"]
NON_EU_DROPPED = ["NEO", "BUE", "SGO", "LSE", "IOB", "SAO", "STO", "JPX", "HKG", "KSC", "MEX"]
EU_EXCHANGES = ["GER", "FRA", "BER", "DUS", "ISE", "MIL", "VIE", "VIE2"]


def read_ticker_workbook(spark: SparkSession, xlsx_path: str) -> DataFrame:
    """A1: one-time xlsx → DataFrame. Spark has no native xlsx reader and
    openpyxl is absent here, so this uses the stdlib zip+XML reader
    (jobs.xlsx_lite) — sufficient for the sparse string matrix the
    reference ships. Unnamed/empty header columns are dropped (the
    workbook has one blank spacer column after 'Company')."""
    from sparkwrangle.jobs.xlsx_lite import read_sheet

    rows = read_sheet(xlsx_path)
    header = rows[0]
    keep = [i for i, h in enumerate(header) if h]
    names = [str(header[i]) for i in keep]
    data = [
        tuple(None if r[i] is None else str(r[i]) for i in keep)
        for r in rows[1:]
    ]
    schema = ", ".join(f"`{n}` string" for n in names)
    return spark.createDataFrame(data, schema)


def wrangle_listings(
    wide: DataFrame,
    company_col: str = "Company",
    drop_companies: tuple[str, ...] = ("Fujitsu",),
) -> DataFrame:
    """Cells 11-14 + 27 of the reference, Spark-first: the sparse wide
    ticker matrix → a long `listings` dimension (company, exchange,
    ticker, ticker_idx) restricted to US + EU exchanges (B3/B4 column
    slices become explicit name lists), minus dropped companies (B5),
    keeping only ELIGIBLE companies: ≥2 live tickers and ≥1 EU listing
    (B13). ticker_idx 0 is the first US listing — the trader's base
    (IntradayRegionArbitrage.py:47)."""
    keep = [c for c in US_EXCHANGES + EU_EXCHANGES if c in wide.columns]
    long = wide.select(
        F.col(company_col).alias("company"),
        *[F.col(c).alias(c) for c in keep],
    ).unpivot(["company"], keep, "exchange", "ticker")
    long = long.filter(
        F.col("ticker").isNotNull() & ~F.col("company").isin(*drop_companies)
    )
    # listing order = sheet column order (US first), the reference's
    # row[1].dropna() order
    order = {ex: i for i, ex in enumerate(US_EXCHANGES + EU_EXCHANGES)}
    long = long.withColumn(
        "exchange_rank",
        F.coalesce(
            *[
                F.when(F.col("exchange") == ex, F.lit(i))
                for ex, i in order.items()
            ]
        ),
    )
    w = Window.partitionBy("company").orderBy("exchange_rank")
    long = long.withColumn("ticker_idx", F.row_number().over(w) - 1)
    # eligibility (B13): ≥2 tickers and at least one EU ('.'-suffixed)
    elig = (
        long.groupBy("company")
        .agg(
            F.count("*").alias("n_tickers"),
            F.max(F.col("ticker").contains(".").cast("int")).alias("has_eu"),
        )
        .filter((F.col("n_tickers") >= 2) & (F.col("has_eu") == 1))
        .select("company")
    )
    return long.join(elig, "company").select(
        "company", "exchange", "ticker", "ticker_idx"
    )
