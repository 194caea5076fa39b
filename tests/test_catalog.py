"""Catalog smoke + oracle equivalence at sf0.001 (fast replica of the
driver's t2 gate; the full sf0.01 run lives in tools/check_oracle.py)."""

from __future__ import annotations

import math

import duckdb
import pytest

from sparkwrangle.catalog import CATALOG
from sparkwrangle.io import TABLES

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.9g}"
        return str(v)

    return sorted("|".join(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, duck, name):
    spec = CATALOG[name]
    sdf = spec.fn(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only contract: runs and has stable schema
        return
    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _norm(sdf.columns, srows) == _norm(dcols, drows)


def test_zorder_covers_full_second_of_day(spark, tmp_path):
    """Regression: second-of-day needs 17 bits (86399 < 2^17); the old
    16-bit interleave dropped bit 16, giving IDENTICAL Morton codes to
    01:48:00 (s=6480) and 18:40:16 (s=72016) — every evening timestamp
    aliased into the early-morning key space, and the shared-truncation
    oracle could never catch it."""
    import pandas as pd

    d = tmp_path / "z"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 01:48:00", "2024-01-01 18:40:16"]
            ),
            "user_id": [7, 7],
            "event_type": ["view", "view"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    ).to_parquet(d / "events.parquet", index=False)
    rows = {r.event_id: r.zval for r in CATALOG["x_zorder_layout"].fn(
        spark, str(d)
    ).collect()}
    assert rows[1] != rows[2]
    assert rows[2] > rows[1]  # the evening key sorts after the morning key
