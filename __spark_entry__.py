"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``gmall2021_flink_dw_spark.registry``: every implemented
operator/query from SURVEY.md §2 registers there with its Spark callable
and (where SQL-expressible) its DuckDB oracle SQL. The pytest suite
(tests/test_oracle_parity.py) runs the same Spark-vs-DuckDB comparison the
driver does.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmall2021_flink_dw_spark.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    registry = load_all()
    return registry["tpch_q1"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
