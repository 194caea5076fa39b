"""asof_join golden tests: every direction × tolerance must match
pandas.merge_asof on randomized series."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparkwrangle.ops.joins import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": ["a"] * 40 + ["b"] * 40,
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in
                   np.sort(rng.integers(0, 10_000, 40)).tolist() * 2],
            "lv": rng.normal(size=80),
        }
    )
    right = pd.DataFrame(
        {
            "k": ["a"] * 25 + ["b"] * 25,
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in
                   np.sort(rng.integers(0, 10_000, 25)).tolist() * 2],
            "rate": rng.normal(size=50),
        }
    )
    # force exact-timestamp collisions (the tie rules differ per direction)
    right.loc[3, "ts"] = left.loc[5, "ts"]
    right.loc[30, "ts"] = left.loc[45, "ts"]
    return left.drop_duplicates(["k", "ts"]), right.drop_duplicates(["k", "ts"])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tol", [None, 300.0])
def test_asof_matches_pandas(spark, frames, direction, tol):
    left, right = frames
    expected = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by=["k"],
            value_col="rate",
            direction=direction,
            tolerance_seconds=tol,
        )
        .toPandas()
        .sort_values(["k", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = expected.sort_values(["k", "ts"], kind="mergesort").reset_index(drop=True)
    assert len(got) == len(exp)
    for i in range(len(exp)):
        e, g = exp.rate[i], got.rate[i]
        if pd.isna(e):
            assert g is None or pd.isna(g), f"row {i} ({direction}, tol={tol})"
        else:
            assert abs(g - e) < 1e-12, f"row {i} ({direction}, tol={tol})"


def test_asof_join_brute_force_fuzz_slice(spark):
    """Committed slice of the asof_join brute-force fuzz
    (tools/fuzz_parity.py::fuzz_asof_join — full campaign in the tool):
    random direction/tolerance trials against a pure-Python
    merge_asof-semantics reference, with dense exact-timestamp ties and
    missing keys — independent of pandas, so it also cross-checks the
    pandas golden above."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools import fuzz_parity as fp

    fp.FAILS.clear()
    fp.fuzz_asof_join(spark, trials=4)
    assert not fp.FAILS, fp.FAILS


def test_temporal_scd2_join_agrees_with_asof_backward(spark):
    """Two expressions of the same semantics must agree row-for-row on
    the real corpus: the SCD2 interval join (c_temporal_scd2_join) and
    the union+ffill backward as-of (asof_join) both snap each click to
    the latest purchase value at or before it."""
    from conftest import SF_ORACLE

    from sparkwrangle.catalog import CATALOG
    from sparkwrangle.io import load_table
    from sparkwrangle.ops.joins import asof_join

    import pyspark.sql.functions as F

    got = {
        (r.event_id, r.user_id): r.asof_rate
        for r in CATALOG["c_temporal_scd2_join"].fn(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("rate")
    )
    want = {
        (r.event_id, r.user_id): (None if r.rate is None else round(r.rate, 6))
        for r in asof_join(
            clicks, purchases, on="ts", by=["user_id"], value_col="rate",
            direction="backward",
        ).collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        g = got[k]
        assert (g is None and v is None) or abs(g - v) < 1e-9, (k, g, v)
