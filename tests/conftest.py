from __future__ import annotations

import pytest

from openedx_event_sink_clickhouse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
