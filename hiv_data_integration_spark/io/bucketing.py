"""Bucketed-table layout: co-located (shuffle-free) joins at scale.

The reference joins fact extracts to dimensions per run with no physical
layout reuse (every polars join rebuilds its hash table; see
update_pnls_report/extract_ist_data.py:66-79). At 100 TB the equivalent
Spark anti-pattern is re-shuffling the same fact table on the same join key
pipeline after pipeline. Bucketing is Spark's native answer: write both
sides pre-hash-partitioned (and optionally pre-sorted) on the join key,
and every subsequent equi join on that key plans as a sort-merge join with
**zero Exchange operators** — the shuffle is paid once at write time and
amortized over every downstream query.

Local note: bucket metadata lives in the session catalog, so tables written
here are joinable co-located within the writing session (or any session
sharing the same metastore in a real deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "colocated_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key_cols: list[str],
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (+ optionally sorted) parquet table.

    ``buckets`` must match across tables that will be joined co-located.
    Sorting by the join key additionally removes the per-task Sort from the
    sort-merge join plan.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, *key_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With both sides bucketed identically on ``on``, Catalyst satisfies the
    join's distribution requirement from the table layout: the physical
    plan contains no Exchange (verify with
    ``"Exchange" not in df._jdf.queryExecution().executedPlan().toString()``
    — tests/test_bucketing.py asserts exactly this).
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
