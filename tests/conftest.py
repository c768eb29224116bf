from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall2021_flink_dw_spark.session import get_spark
from gmall2021_flink_dw_spark.sources.batch import TABLES

UNIT_SF = "/root/testdata/sf0.001"
ORACLE_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{ORACLE_SF}/{t}.parquet')"
        )
    yield con
    con.close()
