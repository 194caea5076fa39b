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


def _window_topk(scored: DataFrame, order_cols, k: int, out_cols) -> DataFrame:
    """Shared per-query top-k tail: rank within query_id by ``order_cols``
    (which must end in a deterministic tiebreak), keep rk ≤ k. One
    definition for every ANN variant so the rank/filter/projection shape
    cannot drift between them."""
    w = Window.partitionBy("query_id").orderBy(*order_cols)
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*out_cols, "rk")
    )


def _adc_scored(codes: DataFrame, lut: DataFrame, join_keys, id_col: str) -> DataFrame:
    """Shared ADC scan: narrow code rows joined to the broadcast
    (subspace, code) → d2 lookup table, summed per (query, neighbor).
    One definition for the self-training and persisted-index paths.

    DECIMAL accumulator: the m per-subspace d2 values arrive in shuffle
    order, and a raw double sum is order-sensitive in the last ulp — with
    duplicate/near-dup vectors (equal true distances) that ulp decides
    the rank tiebreak, so the sum must be order-invariant and
    engine-identical (same idiom as pagerank; the oracle mirrors the
    cast chain). ``_n_sub`` stays on the frame so callers with an
    external index can validate subspace coverage."""
    return (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(lut), list(join_keys))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.col("d2").cast("decimal(38,18)"))
            .cast("double")
            .alias("adc_dist"),
            F.count("*").alias("_n_sub"),
        )
    )


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
    return _window_topk(
        scored,
        [F.desc("cos_sim"), F.asc("neighbor_id")],
        k,
        ["query_id", "neighbor_id", "cos_sim"],
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
    return _window_topk(
        scored,
        [F.desc("cos_sim"), F.asc("neighbor_id")],
        k,
        ["query_id", "neighbor_id", "cos_sim"],
    )


def train_centroids(
    base: DataFrame, cell_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """IVF training step: per-cell centroid = per-dimension mean of the
    cell's vectors (one Lloyd step from the given seed partition). One
    posexplode + one map-side-combinable groupBy; the centroid array is
    reassembled position-sorted. Output: (cell, centroid array<double>).

    Means are ROUNDED to 6 decimals (the same rule as _pq_means and the
    round(avg(x), 6) in the SQL twins): a raw avg() is partition-order
    sensitive in the last ulp, and these centroids feed assign_cells'
    DISCRETE argmax — an unrounded 1-ulp wobble near a cosine tie could
    flip a cell assignment between runs/engines, a membership change no
    output rounding can absorb."""
    dims = base.select(
        F.col(cell_col).alias("cell"), F.posexplode(vec_col).alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    per_dim = dims.groupBy("cell", "pos").agg(F.round(F.avg("x"), 6).alias("c"))
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s.c
        ).alias("centroid")
    )


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_best: int = 1,
) -> DataFrame:
    """IVF assignment step: route each vector to its ``n_best`` nearest
    trained centroids by cosine (centroid table broadcast — it is |cells|
    rows; deterministic ranking tiebreak by cell id). Output: (id, cell,
    cell_rk). n_best=1 is index routing; n_best=nprobe is query fan-out.

    Cell ids must be NUMERIC: the n_best=1 combinable argmax tiebreaks via
    max(struct(cos, −cell)), and a string cell would silently cast the
    negation to NULL (non-deterministic ties) instead of erroring."""
    from pyspark.sql.types import NumericType

    if not isinstance(centroids.schema["cell"].dataType, NumericType):
        raise ValueError(
            f"assign_cells: cell id must be numeric for the deterministic "
            f"argmax tiebreak, got {centroids.schema['cell'].dataType}"
        )
    v = vectors.select(
        F.col(id_col), F.col(vec_col).alias("v_vec"), _norm(F.col(vec_col)).alias("v_norm")
    )
    c = centroids.select(
        "cell", F.col("centroid"), _norm(F.col("centroid")).alias("c_norm")
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col,
        "cell",
        (_dot(F.col("v_vec"), F.col("centroid")) / (F.col("v_norm") * F.col("c_norm"))).alias(
            "cos"
        ),
    )
    if n_best == 1:
        # index routing (the full-base scan): argmax as a COMBINABLE
        # groupBy max(struct(cos, −cell)) — same (cos desc, cell asc)
        # tiebreak as the window, but partial maxima combine map-side
        # instead of full-sorting the |vectors|·K fan-out
        return (
            scored.groupBy(id_col)
            .agg(F.max(F.struct(F.col("cos"), (-F.col("cell")).alias("nc"))).alias("m"))
            .select(id_col, (-F.col("m.nc")).alias("cell"), F.lit(1).alias("cell_rk"))
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("cos"), F.asc("cell"))
    return (
        scored.withColumn("cell_rk", F.row_number().over(w))
        .filter(F.col("cell_rk") <= n_best)
        .select(id_col, "cell", "cell_rk")
    )


def ivf_trained_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_cell_col: str = "label",
    nprobe: int = 1,
) -> DataFrame:
    """End-to-end trained IVF ANN: train centroids → assign base vectors to
    their nearest centroid → probe the query's ``nprobe`` closest cells.
    Unlike ``ivf_cosine_topk`` the cell is the trained quantizer's output,
    not a given column — the full index lifecycle. Raising nprobe trades
    cost for recall (the knob that matters when the corpus lacks cluster
    structure and true neighbors spread across cells)."""
    cents = train_centroids(base, seed_cell_col, vec_col)
    assigned = assign_cells(base, cents, id_col, vec_col, n_best=1)
    base2 = base.join(assigned.drop("cell_rk"), id_col).withColumnRenamed(
        "cell", "ivf_cell"
    )
    q_cells = assign_cells(queries, cents, id_col, vec_col, n_best=nprobe)
    q2 = queries.join(q_cells.drop("cell_rk"), id_col).withColumnRenamed(
        "cell", "ivf_cell"
    )
    return ivf_cosine_topk(base2, q2, k=k, id_col=id_col, vec_col=vec_col,
                           cell_col="ivf_cell")


def hyperplane_planes(dim: int, n_planes: int = 16, seed: int = 13) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH, rounded to 6 decimals
    so both engines parse bit-identical double literals."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [[round(float(v), 6) for v in row] for row in rng.randn(n_planes, dim)]


def lsh_band_buckets(
    df: DataFrame,
    planes: list[list[float]],
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH banding: bit_j = (v·h_j >= 0); the signature
    splits into ``bands`` integer band values. Output long: (id, band,
    band_val) — the join key for candidate generation, all JVM-side fold
    expressions."""
    n = len(planes)
    if bands <= 0 or n % bands != 0:
        raise ValueError(
            f"lsh_band_buckets: bands must evenly divide the plane count "
            f"(got {n} planes, {bands} bands) — a remainder would silently "
            f"drop the last {n % bands if bands > 0 else n} sign bits"
        )
    per = n // bands
    if per >= 32:
        raise ValueError(
            f"lsh_band_buckets: {per} bits per band overflows the int32 "
            f"band_val (max 31) — use more bands or fewer planes"
        )
    bits = [
        (_dot(F.col(vec_col), F.array(*[F.lit(v) for v in plane])) >= 0).cast("int")
        for plane in planes
    ]
    band_cols = []
    for b in range(bands):
        val = None
        for r in range(per):
            term = bits[b * per + r] * F.lit(2**r)
            val = term if val is None else val + term
        band_cols.append(F.struct(F.lit(b).alias("band"), val.alias("band_val")))
    return df.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.band_val")


def lsh_band_buckets_vectorized(
    df: DataFrame,
    planes: list[list[float]],
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched twin of ``lsh_band_buckets``: the 16 per-plane fold
    expressions are interpreted HOF evaluation in the JVM (one lambda call
    + boxing per element — measured 4 s on 2 000×64 f32 locally, and the
    per-row cost scales with corpus size), so the hot path computes the
    sign bits in a pandas UDF instead, vectorized ACROSS ROWS with an
    explicit per-dimension accumulation loop. The j-ascending
    multiply-then-add order is bit-identical IEEE to the fold form and the
    SQL oracle — numpy's pairwise-summing ``dot``/``sum`` would not be,
    and a sign bit sits exactly on the 0 boundary. Property-tested equal
    to the fold form; output schema identical (id, band, band_val).

    Degenerate inputs: a fully-None row still raises (np.stack cannot
    shape it; the fold twin degrades it to NULL band values), and a row
    with a null or NaN ELEMENT emits NULL band_val for every band — a
    bucket-less row that no candidate equi-join will match. (The fold
    twin yields NULL for a null element but, by Spark's NaN-largest
    comparison semantics, sign-bit 1 for a true NaN element — bucketing
    a garbage vector. The forms are bit-identical on null/NaN-free
    input, the property-tested contract; filter degenerate vectors
    upstream when exact twin parity matters.)"""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64)
    n_planes, dim = P.shape
    if bands <= 0 or n_planes % bands != 0:
        raise ValueError(
            f"lsh_band_buckets_vectorized: bands must evenly divide the "
            f"plane count (got {n_planes} planes, {bands} bands)"
        )
    per = n_planes // bands
    if per >= 32:
        raise ValueError(
            f"lsh_band_buckets_vectorized: {per} bits per band overflows "
            f"the int32 band_val (max 31) — use more bands or fewer planes"
        )

    # explicit eval-type annotations (module has PEP-563 string
    # annotations, under which pandas_udf cannot resolve local names)
    def bandvals(emb):
        n = len(emb)
        if n == 0:
            return pd.Series([], dtype=object)
        x = np.stack(emb.to_numpy()).astype(np.float64)
        # a null element arrives as NaN after the Arrow->numpy cast; such
        # a row gets NULL band_vals (bucket-less) instead of the garbage
        # sign pattern `nan >= 0 == False` would silently produce
        bad = np.isnan(x).any(axis=1)
        bits = np.empty((n, n_planes), dtype=bool)
        for p in range(n_planes):
            acc = np.zeros(n)
            for j in range(dim):
                acc = acc + x[:, j] * P[p, j]
            bits[:, p] = acc >= 0
        vals = np.zeros((n, bands), dtype=np.int64)
        for b in range(bands):
            for r in range(per):
                vals[:, b] += bits[:, b * per + r].astype(np.int64) << r
        return pd.Series(
            [
                [
                    {
                        "band": b,
                        "band_val": None if bad[i] else int(vals[i, b]),
                    }
                    for b in range(bands)
                ]
                for i in range(n)
            ]
        )

    bandvals.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    bandvals = pandas_udf("array<struct<band:int,band_val:int>>")(bandvals)

    return df.select(
        F.col(id_col), F.explode(bandvals(F.col(vec_col))).alias("bb")
    ).select(id_col, "bb.band", "bb.band_val")


def lsh_cosine_topk(
    base: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    bands: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH ANN: candidates share at least one signature
    band with the query; exact cosine re-ranks candidates. Candidate
    generation is a bucket equi-join on (band, band_val) — linear, never
    all-pairs; recall/cost tunes via bands × bits-per-band. Banding runs
    Arrow-vectorized (``lsh_band_buckets_vectorized``); the exact cosine
    re-rank stays a JVM fold (candidate set ≪ corpus, and the fold is the
    oracle-parity form)."""
    qb = lsh_band_buckets_vectorized(queries, planes, bands, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), "band", "band_val"
    )
    bb = lsh_band_buckets_vectorized(base, planes, bands, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "band", "band_val"
    )
    cand = (
        bb.join(F.broadcast(qb), ["band", "band_val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
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
    scored = cand.join(F.broadcast(q), "query_id").join(b, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("q_vec"), F.col("b_vec")) / (F.col("q_norm") * F.col("b_norm"))).alias(
            "cos_sim"
        ),
    )
    return _window_topk(
        scored,
        [F.desc("cos_sim"), F.asc("neighbor_id")],
        k,
        ["query_id", "neighbor_id", "cos_sim"],
    )


def embedding_neardup_pairs_gemm(
    base: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via one BLAS GEMM per cell
    (``applyInPandas``) instead of a relational pair self-join.

    Why Python here: the pairwise dot is a dense numeric kernel — the
    relational form materializes |cell|² pair rows each carrying both
    vectors and folds them element-wise (interpreted HOF, ~0.2 µs/mult),
    while one normalized S = M·Mᵀ per cell runs in SIMD BLAS and only the
    above-threshold survivors ever become rows. Measured at sf0.1:
    0.45 s vs 4.4 s for the join form — and the gap widens with dim.
    Arrow moves each vector ONCE (cell rows), not once per pair.

    At 100 TB the group axis is the IVF cell; a cell too big for one task
    splits into row blocks with block-GEMM over the same grouping. Output
    matches :func:`embedding_neardup_pairs` on pair MEMBERSHIP away from
    the threshold boundary (cross-checked in tests); the caveat is honest:
    BLAS sums dot products in an implementation-defined order, so a pair
    whose fold-order cosine sits within ~1 ulp of ``threshold`` can fall
    on either side of the cut depending on the BLAS build — if exact
    boundary semantics matter, use the relational form. cos_sim is raw
    double — callers round for cross-engine hashes.
    """
    import numpy as np
    import pandas as pd

    thr = float(threshold)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.vstack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        # dot-then-divide (not normalize-then-dot) mirrors the relational
        # form's cos = dot/(norm·norm) op order; 0-norm → nan never passes
        norms = np.linalg.norm(M, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            S = (M @ M.T) / np.outer(norms, norms)
        ia, ib = np.triu_indices(len(ids), k=1)
        sims = S[ia, ib]
        keep = sims >= thr
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cos_sim": sims[keep]}
        )

    # id columns keep the INPUT's id type (like the relational twin) —
    # a hardcoded bigint would break string/other orderable id columns
    id_type = base.schema[id_col].dataType.simpleString()
    return base.groupBy(cell_col).applyInPandas(
        cell_pairs, f"id_a {id_type}, id_b {id_type}, cos_sim double"
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


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the 100 TB ANN compression path
# ---------------------------------------------------------------------------


def _sub_l2sq(sv: Column, cent: Column) -> Column:
    """Σ (svᵢ − centᵢ)² in a left-to-right fold — same sequential order as
    the oracle's list_sum(list_transform(...)), so the per-subspace
    distance is bit-identical across engines. Squaring is (a−b)·(a−b),
    never pow() (libm ulp divergence)."""
    return F.aggregate(
        F.zip_with(
            sv,
            cent,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subspace_explode(df: DataFrame, id_col: str, vec_col: str, m: int, d_sub: int):
    """(id, subspace, sv): the vector split into m contiguous d_sub-dim
    subvectors — ONE map-side explode of an array of structs, no shuffle."""
    parts = [
        F.struct(
            F.lit(s).alias("subspace"),
            F.transform(
                F.slice(F.col(vec_col), s * d_sub + 1, d_sub),
                lambda x: x.cast("double"),
            ).alias("sv"),
        )
        for s in range(m)
    ]
    return df.select(
        F.col(id_col), F.explode(F.array(*parts)).alias("p")
    ).select(id_col, "p.subspace", "p.sv")


def _pq_means(assigned: DataFrame, d_sub: int) -> DataFrame:
    """(subspace, cell, centroid): per-dimension means of each cell's
    subvectors, r6-rounded so every downstream DISCRETE step (assignment
    argmin, encode) sees bit-identical centroids on both engines.

    d_sub is a small compile-time constant, so the element-wise mean is
    d_sub parallel avg(sv[j]) aggregates in ONE map-side-combinable
    groupBy — not a posexplode + per-(cell,j) groupBy + collect_list
    reassembly, which costs an extra shuffle and a d_sub× row expansion
    per Lloyd round (measured: the explode form made codebook training
    ~2× slower at sf0.1; values are identical — same multiset per
    position, same r6 round).

    Residual grain risk (documented, accepted): avg() accumulates raw
    doubles, so a cell mean landing within ~1 ulp of a 5e-7 half-up
    boundary could r6-round differently across engines/partitionings.
    Probability ~1e-10 per centroid per round on real data; if a round's
    gate ever flags a PQ query, this is the first suspect (the rf-grain
    playbook in NOTES.md) — the full fix is a DECIMAL sum-then-divide
    mirrored in the oracle AND the pandas trainer, a three-way sync not
    worth the risk while the gates stay green."""
    per = assigned.groupBy("subspace", "cell").agg(
        *[F.round(F.avg(F.col("sv")[j]), 6).alias(f"_c{j}") for j in range(d_sub)]
    )
    return per.select(
        "subspace",
        "cell",
        F.array(*[F.col(f"_c{j}") for j in range(d_sub)]).alias("centroid"),
    )


def _pq_assign(subs: DataFrame, codebooks: DataFrame, id_col: str) -> DataFrame:
    """Route each subvector to its nearest centroid by squared L2
    (deterministic cell-id tiebreak); keeps sv for the next Lloyd step.

    The argmin is ``min(struct(d2, cell))`` — lexicographic struct
    comparison IS the (d2 asc, cell asc) tiebreak, and a groupBy-min
    combines map-side (partial minima per partition), where a
    row_number window would full-sort the |vectors|·K fan-out. ``sv``
    is functionally determined by the group key, so any_value is
    deterministic."""
    scored = subs.join(F.broadcast(codebooks), "subspace").select(
        id_col,
        "subspace",
        "sv",
        "cell",
        _sub_l2sq(F.col("sv"), F.col("centroid")).alias("d2"),
    )
    return scored.groupBy(id_col, "subspace").agg(
        F.any_value("sv").alias("sv"),
        F.min(F.struct("d2", "cell"))["cell"].alias("cell"),
    )


def _r6_spark(x: float):
    """Spark-identical round(x, 6): Spark's Round converts the double via
    BigDecimal.valueOf (= Double.toString, the shortest decimal repr —
    exactly Python's repr) then setScale(6, HALF_UP). Reproducing that
    digit-for-digit keeps the pandas trainer's centroids bit-identical
    to the relational/DuckDB chain."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _pq_train_subspace_pdf(pdf, id_col: str, k_codes: int, iters: int, d_sub: int):
    """One subspace's full quantile-seed + Lloyd chain in a single pandas
    group (the sampled trainer bounds the group): identical math to the
    relational form — rank by (sv[0], id) seeds cell = rank·k // n; each
    round's means are _r6_spark-rounded; d2 is the LEFT-TO-RIGHT fold of
    (x−c)² over dims (sequential loop over dims, vectorized over rows —
    np.sum's pairwise order would diverge from both engines); argmin
    ties break toward the lower cell id (strict < scan in cell order)."""
    import numpy as np
    import pandas as pd

    sub = int(pdf["subspace"].iloc[0])
    sv = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["sv"]])
    ids = pdf[id_col].to_numpy()
    order = np.lexsort((ids, sv[:, 0]))
    sv = sv[order]
    n = len(sv)
    assign = (np.arange(n, dtype=np.int64) * k_codes) // n

    def means_r6(asg):
        out = {}
        for c in np.unique(asg):
            members = sv[asg == c]
            out[int(c)] = [
                _r6_spark(members[:, j].mean()) for j in range(d_sub)
            ]
        return out

    def reassign(cb):
        cells = sorted(cb)
        best_d2 = None
        best_c = None
        for c in cells:
            cent = cb[c]
            acc = np.zeros(n)
            for j in range(d_sub):
                diff = sv[:, j] - cent[j]
                acc = acc + diff * diff
            if best_d2 is None:
                best_d2, best_c = acc, np.full(n, c, dtype=np.int64)
            else:
                better = acc < best_d2  # strict: ties keep the lower cell
                best_d2 = np.where(better, acc, best_d2)
                best_c = np.where(better, c, best_c)
        return best_c

    for _ in range(iters):
        assign = reassign(means_r6(assign))
    cb = means_r6(assign)
    return pd.DataFrame(
        [(sub, c, cb[c]) for c in sorted(cb)],
        columns=["subspace", "cell", "centroid"],
    )


def pq_codebooks(
    base: DataFrame,
    m: int = 8,
    d_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_codes: int = 16,
    iters: int = 2,
    sample_mod: int | None = None,
    pandas_trainer: bool = False,
) -> DataFrame:
    """Per-subspace PQ codebooks by deterministic k-means: seed each
    subspace's k_codes cells from equal-frequency QUANTILES of the
    subvector's first coordinate (a random-partition seed collapses every
    centroid onto the global mean and Lloyd cannot recover), then run
    ``iters`` Lloyd rounds (means r6-rounded each round so the discrete
    reassignment is engine-identical; the same integer rank·k//n bucket
    math on both sides). Output: (subspace, cell, centroid).

    ``sample_mod=S`` trains on the deterministic hash-sample
    ``h60(id) % S == 0`` (portable md5-based hash, mirrored verbatim in
    the DuckDB oracles) — the honest 100 TB form: the seeding rank is a
    per-subspace global sort, so the full-corpus trainer sorts the whole
    corpus where the sampled trainer sorts a BOUNDED set (codebook
    training is always sample-based at scale; encoding and ADC scans are
    the full-corpus paths and never sort). The bounded sample also lets
    the trainer partition by subspace alone (m partitions): every
    downstream Lloyd key — window(subspace), groupBy(subspace, cell),
    groupBy(id, subspace) — is subspace-prefixed, so EnsureRequirements
    inserts ZERO further exchanges and the whole iterated chain runs as
    one pipelined stage per aggregation instead of reshuffling per round.
    """
    if pandas_trainer and sample_mod is None:
        raise ValueError(
            "pandas_trainer requires sample_mod: a per-subspace pandas "
            "group over the FULL corpus is unbounded (corpus/m rows in "
            "one task) — only the hash-sample bounds it"
        )
    train = base
    if sample_mod is not None:
        from sparkwrangle.ext.hashing import h60

        train = base.filter(
            h60(F.col(id_col).cast("string")) % sample_mod == 0
        )
        if pandas_trainer:
            # The sample bounds every per-subspace group, so the entire
            # iterated chain runs as ONE applyInPandas stage (one shuffle,
            # m parallel groups) instead of seed-window + per-round
            # means/assign barriers. Bit-compatible with the relational
            # chain (same rank seed, Spark-identical r6 means, same
            # left-fold d2 and lower-cell tiebreak) — pinned by test.
            subs = _subspace_explode(train, id_col, vec_col, m, d_sub)
            return subs.groupBy("subspace").applyInPandas(
                lambda pdf: _pq_train_subspace_pdf(
                    pdf, id_col, k_codes, iters, d_sub
                ),
                "subspace int, cell int, centroid array<double>",
            )
        subs = _subspace_explode(train, id_col, vec_col, m, d_sub).repartition(
            m, F.col("subspace")
        )
    else:
        # Full-corpus trainer: hash-partition the subvector table ONCE on
        # the Lloyd-loop group key: every per-round _pq_assign joins a
        # BROADCAST codebook (partitioning preserved) and then groups by
        # exactly (id, subspace), so EnsureRequirements inserts no further
        # exchange for any assign round — the only per-round barrier left
        # is the means aggregation. (Partitioning by subspace alone would
        # put corpus/m rows in one partition — only legal on a sample.)
        subs = _subspace_explode(train, id_col, vec_col, m, d_sub).repartition(
            F.col(id_col), F.col("subspace")
        )
    w = Window.partitionBy("subspace").orderBy(
        F.asc(F.col("sv")[0]), F.asc(id_col)
    )
    n = F.count("*").over(Window.partitionBy("subspace"))
    # bigint cast BEFORE the multiply: row_number() is int32, and on the
    # full-corpus path (sample_mod=None) (rn−1)·k_codes would wrap
    # negative past ~2^31/k_codes rows per subspace under non-ANSI Spark,
    # silently corrupting the quantile seed cells
    assigned = subs.withColumn(
        "cell",
        F.floor(
            ((F.row_number().over(w).cast("bigint") - 1) * k_codes) / n
        ).cast("int"),
    )
    for _ in range(iters):
        cb = _pq_means(assigned, d_sub)
        assigned = _pq_assign(subs, cb, id_col)
    return _pq_means(assigned, d_sub)


def pq_encode_long(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    d_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encoding, long format (id, subspace, code): each subvector maps
    to its nearest codebook centroid by squared L2 (deterministic cell-id
    tiebreak via min(struct(d2, cell)) — a COMBINABLE groupBy with
    map-side partial minima, not a sorting window). The codebook
    broadcast is m × |cells| rows — trivially driver-safe."""
    subs = _subspace_explode(vectors, id_col, vec_col, m, d_sub)
    scored = subs.join(F.broadcast(codebooks), "subspace").select(
        id_col,
        "subspace",
        "cell",
        _sub_l2sq(F.col("sv"), F.col("centroid")).alias("d2"),
    )
    return scored.groupBy(id_col, "subspace").agg(
        F.min(F.struct("d2", "cell"))["cell"].alias("code")
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    d_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes wide: (id, c0..c{m-1}) — m small ints replace the d-dim
    float vector (the 8×: 64 floats → 8 codes here; the compression that
    lets a 100 TB embedding corpus fit scan-speed ANN)."""
    long = pq_encode_long(vectors, codebooks, m, d_sub, id_col, vec_col)
    aggs = [
        F.max(F.when(F.col("subspace") == s, F.col("code"))).alias(f"c{s}")
        for s in range(m)
    ]
    return long.groupBy(id_col).agg(*aggs)


def pq_adc_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    d_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_codes: int = 16,
    iters: int = 2,
    route_col: str | None = None,
    train_sample_mod: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: train codebooks → encode
    the base ONCE → per query, precompute the (subspace, code) → distance
    LOOKUP TABLE (m·K rows per query) and broadcast it; the base side is
    then a narrow scan of its codes joined to the LUT and a groupBy sum —
    the raw base vectors are never touched at query time. This is the PQ
    scan shape: query cost scales with |base|·m code rows, not |base|·d
    floats. Output: (query_id, neighbor_id, adc_dist, rk), rk by
    ascending quantized distance with neighbor-id tiebreak.

    ``route_col`` names a coarse IVF cell column on both frames: the ADC
    scan then touches only base codes in the query's cell — the faiss
    IVFPQ composition (coarse quantizer prunes the scan, PQ compresses
    what remains; costs multiply: cells× fewer rows, each 8× narrower).

    The product contract is shortlist + exact re-rank: ask for k = a few
    × the final k and re-rank the shortlist with exact distances (the
    recall test pins shortlist@4k recovering every brute-force
    neighbor); ADC order alone is quantized and ties within a cell.

    The codebook is materialized once (``localCheckpoint`` — m·K rows):
    both consumers (base encode, query LUT) would otherwise re-run the
    whole iterated training chain; at scale the codebook persists as a
    table and this is a read. (Two measured dead ends at sf0.1: the
    literal-inlined map-side encode — building its 128-centroid
    expression tree through py4j per call is 3× slower end-to-end than
    the relational encode — and collect+createDataFrame in place of the
    checkpoint, which adds a driver round-trip per query.)"""
    cb = pq_codebooks(
        base, m, d_sub, id_col, vec_col, k_codes, iters,
        sample_mod=train_sample_mod,
        # sampled ⇒ bounded groups ⇒ the one-stage pandas chain (2× the
        # relational trainer's speed, bit-identical output — pinned)
        pandas_trainer=train_sample_mod is not None,
    ).localCheckpoint()
    codes = pq_encode_long(base, cb, m, d_sub, id_col, vec_col)
    q_subs = _subspace_explode(queries, id_col, vec_col, m, d_sub)
    lut = q_subs.join(F.broadcast(cb), "subspace").select(
        F.col(id_col).alias("query_id"),
        "subspace",
        F.col("cell").alias("code"),
        _sub_l2sq(F.col("sv"), F.col("centroid")).alias("d2"),
    )
    join_keys = ["subspace", "code"]
    if route_col:
        codes = codes.join(base.select(id_col, F.col(route_col).alias("route")), id_col)
        lut = lut.join(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(route_col).alias("route")
            ),
            "query_id",
        )
        join_keys.append("route")
    scored = _adc_scored(codes, lut, join_keys, id_col)
    return _window_topk(
        scored,
        [F.asc("adc_dist"), F.asc("neighbor_id")],
        k,
        ["query_id", "neighbor_id", "adc_dist"],
    )


def collect_codebooks(codebooks: DataFrame) -> dict[int, list[tuple[int, list[float]]]]:
    """Bounded codebook collect (m·K rows — a training artifact, like the
    decontamination eval set): {subspace: [(cell, centroid), ...]} sorted
    by cell for deterministic literal construction."""
    out: dict[int, list[tuple[int, list[float]]]] = {}
    for r in codebooks.collect():
        out.setdefault(int(r["subspace"]), []).append(
            (int(r["cell"]), [float(x) for x in r["centroid"]])
        )
    for s in out:
        out[s].sort()
    return out


def pq_encode_mapside(
    vectors: DataFrame,
    codebook_rows: dict[int, list[tuple[int, list[float]]]],
    m: int = 8,
    d_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """PQ encoding as a PURE PROJECTION — the streaming-legal form: the
    trained codebook inlines as literals and each subspace's code is
    ``array_min`` over (d2, cell) structs — lexicographic struct
    comparison IS the (d2 asc, cell asc) tiebreak — so a stream encodes
    per micro-batch with no window, no join, no state
    (``pq_encode_long``'s window argmin is illegal on a stream).
    Bit-identical to the join+window form (pinned by test). Each d2
    expression appears ONCE in the array (a chained when/otherwise
    argmin re-references the running best per level and the expression
    tree goes exponential in the cell count).
    Output: (id, [keep_cols,] c0..c{m-1})."""
    sub_cols = []
    for s in range(m):
        sv = F.transform(
            F.slice(F.col(vec_col), s * d_sub + 1, d_sub),
            lambda x: x.cast("double"),
        )
        cands = [
            F.struct(
                _sub_l2sq(sv, F.array(*[F.lit(float(c)) for c in cent])).alias(
                    "d2"
                ),
                F.lit(cell).alias("cell"),
            )
            for cell, cent in codebook_rows.get(s, [])
        ]
        sub_cols.append(F.array_min(F.array(*cands))["cell"].alias(f"c{s}"))
    return vectors.select(F.col(id_col), *(keep_cols or []), *sub_cols)


def pq_rerank_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    m: int = 8,
    d_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_codes: int = 16,
    iters: int = 2,
    train_sample_mod: int | None = None,
) -> DataFrame:
    """The recommended PQ query path: ADC SHORTLIST (cheap, quantized,
    over-fetched ``shortlist`` candidates from the code scan) + EXACT
    cosine re-rank of just those candidates. The expensive exact math
    touches |Q|·shortlist vectors instead of |Q|·|base| — with the
    shortlist recall pinned at 1.0 on clustered data, the final top-k
    equals brute force at a fraction of the cost. Output:
    (query_id, neighbor_id, cos_sim, rk)."""
    short = pq_adc_topk(
        base, queries, k=shortlist, m=m, d_sub=d_sub,
        id_col=id_col, vec_col=vec_col, k_codes=k_codes, iters=iters,
        train_sample_mod=train_sample_mod,
    ).select("query_id", "neighbor_id")
    b = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("b_vec"),
        _norm(F.col(vec_col)).alias("b_norm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    exact = short.join(F.broadcast(q), "query_id").join(b, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("q_vec"), F.col("b_vec"))
            / (F.col("q_norm") * F.col("b_norm"))
        ).alias("cos_sim"),
    )
    return _window_topk(
        exact,
        [F.desc("cos_sim"), F.asc("neighbor_id")],
        k,
        ["query_id", "neighbor_id", "cos_sim"],
    )


def pq_adc_from_index(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    d_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k against a PERSISTED index (the build-once/query-many
    contract): ``codes`` and ``codebooks`` are the parquet artifacts of
    tools/ann.py. Per query a broadcast (subspace, code) → distance
    lookup table; the base side is a narrow scan of its codes + one
    combinable groupBy sum — the raw embedding column of the corpus is
    never read at query time. Output (query_id, neighbor_id, adc_dist,
    rk); shared by the batch CLI and the streaming foreachBatch server.

    The index artifacts are EXTERNAL, so coverage is validated: the
    codebooks' distinct subspace count must equal ``m`` (a build-time
    check — one bounded job over an m·K-row frame), and every scored
    pair must have summed exactly m subspace distances (an executor-side
    raise; a corrupt/mismatched codes table would otherwise silently
    drop subspaces from the join and rank by a PREFIX of the true
    distance).
    """
    idx_m = codebooks.agg(F.countDistinct("subspace").alias("n")).collect()[0]["n"]
    if idx_m != m:
        raise ValueError(
            f"pq_adc_from_index: index has {idx_m} subspaces but m={m} "
            f"was requested — wrong m/d_sub for this persisted index"
        )
    q_subs = _subspace_explode(queries, id_col, vec_col, m, d_sub)
    lut = q_subs.join(F.broadcast(codebooks), "subspace").select(
        F.col(id_col).alias("query_id"),
        "subspace",
        F.col("cell").alias("code"),
        _sub_l2sq(F.col("sv"), F.col("centroid")).alias("d2"),
    )
    scored = _adc_scored(codes, lut, ["subspace", "code"], id_col).withColumn(
        "adc_dist",
        F.when(F.col("_n_sub") == m, F.col("adc_dist")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("pq_adc_from_index: pair summed "),
                    F.col("_n_sub").cast("string"),
                    F.lit(f" of {m} subspaces — corrupt or mismatched index"),
                )
            )
        ),
    )
    return _window_topk(
        scored,
        [F.asc("adc_dist"), F.asc("neighbor_id")],
        k,
        ["query_id", "neighbor_id", "adc_dist"],
    )
