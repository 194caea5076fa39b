"""pandas-on-Spark interop: a reference user can keep pandas idioms.

The EP1 preparation written in pyspark.pandas (pivot, pct_change, log,
dropna) must produce the same frame as the engine's Catalyst pipeline —
the migration path for the reference's pandas code before rewriting to
the DataFrame API."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sparkwrangle.pipelines.daily_pairs import prepare_pair

from fixtures import bars_daily


def test_pandas_on_spark_ep1_prep_matches_engine(spark):
    ps = pytest.importorskip("pyspark.pandas")
    import warnings

    warnings.filterwarnings("ignore")
    # NOTE: zero_close=False — pandas-on-Spark inherits Spark's x/0 →
    # NULL (row dropped by dropna) while real pandas yields ±inf (row
    # kept, then replaced); the engine's Catalyst pipeline reproduces
    # REAL pandas, so the /0 edge is covered by the golden tests instead.
    pdf = bars_daily(n_days=300, zero_close=False)
    pdf["ts"] = pdf["ts"].dt.tz_localize(None)

    # --- pandas-on-Spark version of cells 1/3/5 ---
    psdf = ps.from_pandas(pdf)
    wide = psdf.pivot_table(
        index=["ts"], columns="ticker", values="close", aggfunc="first"
    ).sort_index()
    a1 = wide["AAA"]
    a2 = wide["BBB"] * 1500.0
    frame = a2.to_frame("c2")  # ps.DataFrame(dict-of-ps.Series) iterates
    frame["delta"] = (a2 - a1) / a2
    # np.log doesn't dispatch over ps.Series; .apply keeps exact numpy
    # scalar semantics (log(0) → -inf) at test scale
    frame["ret2"] = (1 + a2.ffill().pct_change()).apply(np.log)
    frame["ret1"] = (1 + a1.ffill().pct_change()).apply(np.log)
    got_ps = frame.dropna().replace([np.inf, -np.inf], 0.0).to_pandas().sort_index()

    # --- engine version ---
    engine = (
        prepare_pair(spark.createDataFrame(pdf), "AAA", "BBB", 1500.0, from_ts=None)
        .orderBy("ts")
        .toPandas()
        .set_index("ts")
    )
    assert len(got_ps) == len(engine)
    for col in ["delta", "ret1", "ret2"]:
        diff = np.abs(got_ps[col].to_numpy() - engine[col].to_numpy())
        assert np.nanmax(diff) < 1e-9, col
