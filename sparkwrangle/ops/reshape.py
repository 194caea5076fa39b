"""Set ops, dedup, reshape (SURVEY.md §2.F/G).

Pivot is a terminal presentation step only — at 100 TB the engine keeps
long format (a pivot to 41 columns is fine; a pivot to 1M columns is a
design bug). Unpivot uses the built-in ``unpivot``/``stack``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_by_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """Idempotent-backtest guard (G1): ``row[0] not in histories``
    (intra_day_arbitrage.ipynb:11124). Deterministic variant of
    dropDuplicates: keep the min of a tiebreak ordering would need a
    window; for pure key-dedup dropDuplicates is enough."""
    return df.dropDuplicates(keys)


def pivot_wide(
    df: DataFrame,
    index_col: str,
    pivot_col: str,
    value_col: str,
    values: list[str] | None = None,
) -> DataFrame:
    """Wide reshape (G3): per-company balance columns
    (intra_day_arbitrage.ipynb:11144-11158). Passing ``values`` explicitly
    skips the extra distinct-scan Spark otherwise runs to discover them.

    Cells aggregate with MIN, not first(): identical when (index, pivot)
    is unique — the balance-pivot contract — and DETERMINISTIC when a
    duplicate slips in (first() keeps whichever partition's row the
    scheduler delivers, which can differ between runs and task retries)."""
    g = df.groupBy(index_col)
    p = g.pivot(pivot_col, values) if values else g.pivot(pivot_col)
    return p.agg(F.min(value_col))


def unpivot_long(
    df: DataFrame,
    ids: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Inverse melt (G3): wide → long via built-in unpivot."""
    return df.unpivot(ids, value_cols, var_name, value_name)
