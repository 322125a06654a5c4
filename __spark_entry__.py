"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in ``hiv_data_integration_spark.battery``;
this file is just the stable driver-facing façade.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hiv_data_integration_spark.battery import ORACLE, QUERIES, q_flagship
from hiv_data_integration_spark.battery_ext import EXT_ORACLE, EXT_QUERIES
from hiv_data_integration_spark.battery_sql import SQL2_ORACLE, SQL2_QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship (SURVEY.md §7.5) exercises the spine every reference
    extract repeats: scan → broadcast dim joins → derived column-name
    synthesis → explicit-values pivot → grouped null-preserving re-sum →
    wide→long stack → rounding → sort.
    """
    return q_flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.14
    extensions: dedup / similarity / text analysis / multimodal)."""
    return {**QUERIES, **EXT_QUERIES, **SQL2_QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each query (same column names).

    Keys intentionally absent (mapInPandas decode/frame stubs) get the
    driver's weaker rows-only check.
    """
    return {**ORACLE, **EXT_ORACLE, **SQL2_ORACLE}
