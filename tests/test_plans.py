"""Plan-quality regression tests: the physical plans the engine promises
(SCALE.md) — pushdown reaching the scan, pruned read schemas, broadcast
joins for dimensions, no Python in relational paths."""

from __future__ import annotations

import pytest

from sparkwrangle.catalog import CATALOG

from conftest import SF_SMOKE


def _plan(spark, name):
    # formatted explain — toString() truncates long fields like
    # PushedFilters/ReadSchema
    jdf = CATALOG[name].fn(spark, SF_SMOKE)._jdf
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def test_scan_pushdown_reaches_parquet(spark):
    plan = _plan(spark, "a_scan_pushdown")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    # column pruning: only the needed columns in the read schema
    assert "l_tax" not in plan and "l_returnflag" not in plan


def test_dimension_joins_broadcast(spark):
    for name in ["c_join_delta", "tpch_q5_local_supplier", "c_block_range_join"]:
        plan = _plan(spark, name)
        assert "Broadcast" in plan, name
        assert "SortMergeJoin" not in plan, f"{name}: dimension join shuffled"


def test_global_topk_avoids_full_sort(spark):
    plan = _plan(spark, "q_global_sort_limit")
    assert "TakeOrderedAndProject" in plan


def test_relational_paths_are_python_free(spark):
    # no ArrowEvalPython / BatchEvalPython / FlatMapGroupsInPandas outside
    # the two stateful operators and the multimodal stub
    for name in [
        "tpch_q1_pricing_summary",
        "w_minmax_normalize",
        "c_asof_union_ffill",
        "x_dedup_minhash_lsh",
        "x_knn_cosine_brute",
        "x_text_stats",
    ]:
        plan = _plan(spark, name)
        for marker in ("EvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
            assert marker not in plan, f"{name} runs Python on executors"


def test_stateful_operator_prunes_before_udf(spark):
    plan = _plan(spark, "s2_intraday_trader")
    assert "FlatMapGroupsInPandas" in plan
    # props/event_type never reach the UDF: projection happens below it
    assert "props" not in plan


# names whose plans legitimately run Python on executors
_PYTHON_OK = {
    "s1_daily_pairs_backtest",
    "s1_compounded_return",
    "s2_intraday_trader",
    "s2_trader_single_position",  # same applyInPandas trader, restricted regime
    "s2_trader_percent_ledger",  # same trader, percent sizing + ledger output
    "ep2_full_pipeline",
    "ep2_trader_single_position",  # same applyInPandas trader, restricted regime
    "ep2_trader_percent_ledger",  # same trader, reference percent sizing
    "x_multimodal_features",
    "x_multimodal_bmp_decode",  # binary synth + real BMP parse, Arrow-batched
    "x_multimodal_wav_decode",  # binary synth + real RIFF/PCM parse
    "x_multimodal_png_decode",  # binary synth + real zlib/unfilter decode
    "x_multimodal_png_interlaced",  # same decode, Adam7 wire layout
    "x_multimodal_jpeg_decode",  # binary synth + real Huffman/IDCT decode
    "x_multimodal_jpeg_progressive",  # four-scan SOF2 decode, same kernel
    "x_image_resize",  # nearest-neighbor BMP resample, Arrow-batched
    "x_audio_features",  # PCM DSP features (energy/peak/zcr/rms)
    "x_frame_sampling",
    # dense numeric kernel: one BLAS GEMM per cell beats the relational
    # pair join 10× (see ext/similarity.embedding_neardup_pairs_gemm)
    "x_embedding_neardup",
    "x_semantic_dedup",  # same GEMM kernel over trained cells
    # sign-LSH banding: vectorized Arrow batches replace interpreted HOF
    # folds (ext/similarity.lsh_band_buckets_vectorized)
    "x_knn_lsh_hyperplane",
    # sampled PQ trainer: the bounded hash-sample runs the whole
    # quantile-seed + Lloyd chain as ONE applyInPandas stage per
    # subspace (ext/similarity._pq_train_subspace_pdf) — bit-identical
    # to the relational chain, pinned by test
    "x_knn_pq_adc",
    "x_knn_pq_rerank",
    "x_knn_ivfpq",
    "x_stream_ann_batch_twin",  # same sampled pandas trainer as the PQ family
}


def test_plan_linter_all_queries(spark):
    """Sweep every catalog query's physical plan for red flags: row-wise
    Python eval in relational paths and accidental cartesian products.
    ArrowEvalPython is linted too — vectorized scalar UDFs are still
    Python on executors and must be on the sanctioned list."""
    problems = []
    for name in sorted(CATALOG):
        plan = _plan(spark, name)
        if name not in _PYTHON_OK:
            for marker in (
                "BatchEvalPython",
                "ArrowEvalPython",
                "FlatMapGroupsInPandas",
                "MapInPandas",
            ):
                if marker in plan:
                    problems.append(f"{name}: {marker}")
        if "CartesianProduct" in plan and "broadcast" not in plan.lower():
            problems.append(f"{name}: un-broadcast CartesianProduct")
    assert not problems, problems


# Queries whose single-partition exchanges carry provably BOUNDED rows
# for a reason the child-is-partial-aggregate rule cannot see. Each
# entry must say why; an unexplained name here is a review failure.
_SINGLE_PARTITION_OK = {
    # the empty-partition renormalization window runs over the
    # per-source aggregate — rows bounded by source cardinality
    "x_source_mixing_weights",
    # the CDF running-sum window runs over the FINAL per-bin aggregate
    # — rows bounded by the fixed 256-bin histogram width
    "x_histogram_quantiles",
    # the global prefix sum's TOP (third) level: the only global window
    # runs over the per-top-group aggregate — one row per
    # 4096·4096·256-doc group, i.e. corpus/2^32 rows (a few hundred even
    # at 10^12 docs). Levels one and two are windows partitioned by
    # their parent key and never see more than 4096 child totals.
    "x_sequence_packing",
}


def test_no_unbounded_single_partition_exchange(spark):
    """No plan may funnel UNBOUNDED data through Exchange
    SinglePartition — a global row_number/sort over corpus-scale input
    serializes one task (the c_positional_join bug class, fixed in
    round 7; bounded heads plan as TakeOrderedAndProject and need no
    exchange at all). A single-partition exchange is fine when its
    input is provably tiny: a global scalar aggregate ships one
    PARTIAL row per upstream partition (child line shows partial_*),
    and the explicit allowlist covers bounded-cardinality finals.
    Checks the executedPlan string — the formatted explain renders the
    exchange as 'Arguments: SinglePartition', which a naive substring
    lint never matches (found the hard way in round 7)."""
    problems = []
    for name in sorted(CATALOG):
        jdf = CATALOG[name].fn(spark, SF_SMOKE)._jdf
        plan = jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            child = lines[i + 1] if i + 1 < len(lines) else ""
            if "partial_" in child:
                continue  # global agg: one partial row per partition
            if name in _SINGLE_PARTITION_OK:
                continue
            problems.append(f"{name}: Exchange SinglePartition over {child.strip()[:80]!r}")
    assert not problems, problems
