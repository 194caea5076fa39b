"""Similarity search over embedding columns (north-star §2.J).

Brute-force cosine top-k is the correctness baseline: query set broadcast,
dot products as ``F.aggregate``/``F.zip_with`` fold expressions (JVM-side,
codegen'd — no Python). The scale path is IVF: restrict the search to the
query's coarse cell (here the ``label`` column plays the IVF centroid
assignment), cutting the candidate set by the cell count — the standard
recall/cost trade of approximate NN at 100 TB. An LSH variant would bucket
by random-hyperplane signs the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, left-to-right fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest base
    vectors (excluding itself), deterministic tiebreak by neighbor id.

    queries is small → broadcast; the scan over base stays partition-local
    (no shuffle until the per-query top-k, which is a tiny window).
    Norms are computed ONCE per side before the join — the pairwise work
    is a single dot product, not three folds."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    b = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("b_vec"),
        _norm(F.col(vec_col)).alias("b_norm"),
    )
    joined = b.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("q_vec"), F.col("b_vec")) / (F.col("q_norm") * F.col("b_norm"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def ivf_cosine_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse cell (nprobe=1).

    The join key gains the cell id, so each query scores |base|/cells
    candidates instead of |base| — the 100 TB path, trading recall at cell
    boundaries for a cells× cost cut."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
        F.col(cell_col).alias("q_cell"),
    )
    b = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("b_vec"),
        _norm(F.col(vec_col)).alias("b_norm"),
        F.col(cell_col).alias("b_cell"),
    )
    joined = b.join(
        F.broadcast(q),
        (F.col("q_cell") == F.col("b_cell"))
        & (F.col("query_id") != F.col("neighbor_id")),
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("q_vec"), F.col("b_vec")) / (F.col("q_norm") * F.col("b_norm"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def embedding_neardup_pairs(
    base: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold).
    With a cell column the self-join is cell-local (IVF pruning); without,
    it is the exact quadratic check."""
    cols_a = [F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
              _norm(F.col(vec_col)).alias("norm_a")]
    cols_b = [F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
              _norm(F.col(vec_col)).alias("norm_b")]
    if cell_col:
        cols_a.append(F.col(cell_col).alias("cell_a"))
        cols_b.append(F.col(cell_col).alias("cell_b"))
    a = base.select(*cols_a)
    b = base.select(*cols_b)
    cond = F.col("id_a") < F.col("id_b")
    if cell_col:
        cond = cond & (F.col("cell_a") == F.col("cell_b"))
    pairs = a.join(b, cond).select(
        "id_a",
        "id_b",
        (_dot(F.col("vec_a"), F.col("vec_b")) / (F.col("norm_a") * F.col("norm_b"))).alias(
            "cos_sim"
        ),
    )
    return pairs.filter(F.col("cos_sim") >= threshold)
