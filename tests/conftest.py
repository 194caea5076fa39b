from __future__ import annotations

import pytest

from sparkwrangle.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("sparkwrangle-tests", master="local[4]", shuffle_partitions=8)
    yield spark
