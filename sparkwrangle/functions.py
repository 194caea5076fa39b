"""Scalar function surface (SURVEY §2.H/J).

Everything the engine needs is a built-in Catalyst expression — that IS
the design (UDFs are the slow path). This module holds the one sanctioned
escape hatch: an Arrow-vectorized scalar ``pandas_udf`` template for
numeric helpers that genuinely cannot be expressed with built-ins (none
of the reference's can — ``zscore`` below exists to pin the pattern and
its equivalence to the built-in form in tests).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def zscore_pandas_udf(v: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
    """Arrow-vectorized (value − mean)/std. Batch-local numpy arithmetic;
    the group statistics arrive as columns so the UDF stays stateless and
    embarrassingly parallel.

    Degenerate groups must come back NULL, matching the built-in exactly:
    a 1-row group has std NULL (Arrow delivers it as NaN) and a constant
    group has std 0 — the builtin's non-ANSI x/NULL and x/0 both yield
    NULL, while raw pandas division would emit NaN/±inf, silently
    breaking the pinned equivalence on any data with such a group."""
    out = (v - mean) / std
    ok = std.notna() & (std != 0.0)
    # object dtype carries real None (Arrow null) — float NaN would come
    # back as Spark NaN, which is NOT the builtin's NULL
    return out.astype(object).where(ok, None)


def zscore_builtin(df: DataFrame, value_col: str, keys: list[str]) -> DataFrame:
    """The built-in form — what production code should use: group stats
    via window aggregates, arithmetic in codegen."""
    w = Window.partitionBy(*keys)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    return df.withColumn("zscore", (F.col(value_col) - mean) / std)


def zscore_udf_path(df: DataFrame, value_col: str, keys: list[str]) -> DataFrame:
    """Same semantics through the pandas-UDF escape hatch (for the
    equivalence test; ~10-100× slower than the built-in in the hot path)."""
    w = Window.partitionBy(*keys)
    return df.withColumn(
        "zscore",
        zscore_pandas_udf(
            F.col(value_col),
            F.avg(value_col).over(w),
            F.stddev_samp(value_col).over(w),
        ),
    )
