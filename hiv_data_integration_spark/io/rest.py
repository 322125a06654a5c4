"""REST-API source adapters: distributed fan-out fetch with retry.

Reference semantics re-expressed Spark-first:

- S4 DHIS2 analytics scan (``update_pnls_report/extract_ist_data.py:58-64``;
  raw variant ``update_pnls_report/extract_pec_data.py:209-213``): fetch the
  long fact shape ``(data_element_id, category_option_combo_id,
  organisation_unit_id, period, value)`` for a (data-elements × periods)
  request grid.
- S5 NAOMI scan (``update_pnls_report/extract_naomi_data.py:64-96``): a
  28-request grid (indicator × sex × age), each returning nested JSON
  ``[{"subareas": [{"subareas": [{code, name, mean}]}]}]``.
- S6 parallel fetch harness (``update_pnls_report/utils.py:54-96``): 5
  worker threads, retry once after a sleep, log-and-drop on the second
  failure.

Spark design: the request grid becomes a **parameter DataFrame**,
repartitioned so each task owns a slice of the grid; the fetch runs inside
``mapInPandas`` (task parallelism replaces the thread pool; a 1000-executor
cluster fans out 1000-wide instead of 5-wide). Retry/drop lives inside the
partition function. The fetch callable is injected — tests use fakes; a
production deployment passes a closure over ``requests``. Fetchers must be
self-contained (cloudpickle ships them by value to workers).

Nested-JSON flattening happens JVM-side: the fetcher returns raw JSON
strings and ``flatten_naomi_json`` applies ``from_json`` + double
``F.explode`` — the UDTF-shaped logic of the reference's list
comprehension, as Catalyst operators.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "fetch_distributed",
    "ANALYTICS_SCHEMA",
    "dhis2_analytics_source",
    "NAOMI_FETCH_SCHEMA",
    "naomi_grid",
    "naomi_source",
    "flatten_naomi_json",
]

# Long fact contract for DHIS2-style analytics extracts (§1.1.2).
ANALYTICS_SCHEMA = T.StructType(
    [
        T.StructField("data_element_id", T.StringType()),
        T.StructField("category_option_combo_id", T.StringType()),
        T.StructField("organisation_unit_id", T.StringType()),
        T.StructField("period", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

# Raw JSON payload shape returned by the NAOMI fetcher (one row per request).
NAOMI_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("indicator", T.StringType()),
        T.StructField("coc_name", T.StringType()),
        T.StructField("payload_json", T.StringType()),
    ]
)

_NAOMI_JSON_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField(
                "subareas",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "subareas",
                                T.ArrayType(
                                    T.StructType(
                                        [
                                            T.StructField("code", T.StringType()),
                                            T.StructField("name", T.StringType()),
                                            T.StructField("mean", T.DoubleType()),
                                        ]
                                    )
                                ),
                            )
                        ]
                    )
                ),
            )
        ]
    )
)


def fetch_distributed(
    params: DataFrame,
    fetch_fn: Callable[[dict], list[dict]],
    out_schema: T.StructType,
    max_retries: int = 1,
    retry_sleep: float = 5.0,
    tasks: int | None = None,
) -> DataFrame:
    """Distributed fetch: one ``fetch_fn(param_row) -> [row_dict]`` call per
    grid row, executed inside ``mapInPandas`` partitions.

    Retry policy mirrors the reference harness: on exception sleep
    ``retry_sleep`` and retry up to ``max_retries`` times, then **drop the
    request** (yield nothing for it) — partial results beat a failed job
    for monitoring-style pipelines. ``tasks`` repartitions the grid to
    bound per-task request counts (default: leave partitioning alone).
    """
    out_cols = [f.name for f in out_schema.fields]

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time as _time

        for pdf in batches:
            rows: list[dict] = []
            for param in pdf.to_dict("records"):
                attempt = 0
                while True:
                    try:
                        rows.extend(fetch_fn(param))
                        break
                    except Exception:
                        attempt += 1
                        if attempt > max_retries:
                            break  # drop this request
                        _time.sleep(retry_sleep)
            yield pd.DataFrame(rows, columns=out_cols)

    if tasks:
        params = params.repartition(tasks)
    return params.mapInPandas(run_partition, out_schema)


def dhis2_analytics_source(
    spark: SparkSession,
    fetch_fn: Callable[[dict], list[dict]],
    data_elements: list[str],
    periods: list[str],
    org_unit_level: int = 4,
    **fetch_kw,
) -> DataFrame:
    """DHIS2 analytics extract: fan the (data_element × period) grid out to
    executors; each fetch returns long-format rows (ANALYTICS_SCHEMA).

    The org-unit level is pushed down into each request — predicate
    pushdown for a REST source is parameterization, exactly as the
    reference pushes ``org_unit_levels=[4]`` into the API call.
    """
    grid = spark.createDataFrame(
        [(de, pe, org_unit_level) for de in data_elements for pe in periods],
        "data_element string, period string, org_unit_level int",
    )
    return fetch_distributed(grid, fetch_fn, ANALYTICS_SCHEMA, **fetch_kw)


# NAOMI request grid: 2 indicators × 2 sexes × 7 age codes = 28 requests
# (update_pnls_report/extract_naomi_data.py:42-75).
_NAOMI_INDICATORS = ["aware_plhiv_num", "plhiv"]
_NAOMI_SEXES = ["male", "female"]
_NAOMI_AGES = [
    "Y000_004", "Y005_009", "Y010_014", "Y015_019",
    "Y020_024", "Y025_049", "Y050_999",
]


def naomi_grid(spark: SparkSession) -> DataFrame:
    """The 28-cell (indicator × sex × age_code) request grid."""
    return spark.createDataFrame(
        [
            (ind, sex, age)
            for ind in _NAOMI_INDICATORS
            for sex in _NAOMI_SEXES
            for age in _NAOMI_AGES
        ],
        "indicator string, sex string, age_code string",
    )


def flatten_naomi_json(raw: DataFrame) -> DataFrame:
    """Flatten NAOMI nested-subareas JSON JVM-side.

    ``from_json`` + two ``explode``s replace the reference's Python list
    comprehension (``update_pnls_report/extract_naomi_data.py:78-84``) —
    the one UDTF-shaped operation in the reference, expressed as Catalyst
    generators so it codegens and scales with the data, not the driver.
    """
    parsed = raw.withColumn(
        "doc", F.from_json(F.col("payload_json"), _NAOMI_JSON_SCHEMA)
    )
    return (
        parsed.select(
            "indicator", "coc_name", F.explode("doc").alias("top")
        )
        .select("indicator", "coc_name", F.explode("top.subareas").alias("mid"))
        .select("indicator", "coc_name", F.explode("mid.subareas").alias("leaf"))
        .select(
            F.col("leaf.code").alias("code"),
            F.col("leaf.name").alias("name"),
            F.col("leaf.mean").alias("mean"),
            "indicator",
            "coc_name",
        )
    )


def naomi_source(
    spark: SparkSession,
    fetch_fn: Callable[[dict], list[dict]],
    **fetch_kw,
) -> DataFrame:
    """NAOMI estimates source: 28-request fan-out → JVM-side JSON flatten.

    ``fetch_fn`` receives ``{indicator, sex, age_code}`` and returns one
    row ``{indicator, coc_name, payload_json}`` (or [] / raise to drop /
    retry). Output: ``(code, name, mean, indicator, coc_name)``.
    """
    raw = fetch_distributed(
        naomi_grid(spark), fetch_fn, NAOMI_FETCH_SCHEMA, **fetch_kw
    )
    return flatten_naomi_json(raw)
