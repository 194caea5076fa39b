from __future__ import annotations

import pytest

from sparkwrangle.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import os
    import tempfile

    wh = os.path.join(tempfile.gettempdir(), "sparkwrangle-warehouse-tests")
    spark = get_spark(
        "sparkwrangle-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield spark
