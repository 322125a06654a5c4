"""Report consolidation: wide pathologies → the golden long format (§1.4).

Reference sites: ``transform_for_pnls_reporting`` applications + diagonal
concat + org-path join + idsite/periode normalization
(``update_pnls_report/pipeline.py:236-365``).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hiv_data_integration_spark.constants import (
    ALWAYS_PADDED_REPORT_COLUMNS,
    DEFAULT_ROOT_ORG_UNIT,
)
from hiv_data_integration_spark.functions import (
    idsite_from_path,
    period_to_date,
    round_to_long,
)
from hiv_data_integration_spark.operators.relational import union_relaxed
from hiv_data_integration_spark.operators.reshape import pad_to_contract, stack_by_prefix

__all__ = ["REPORT_KEY_COLUMNS", "stack_pathologies", "finalize_report"]

REPORT_KEY_COLUMNS = ["idsite", "periode", "Indicateur"]


def stack_pathologies(
    wides: list[tuple[DataFrame, Mapping[str, int]]],
    key_cols: list[str],
) -> DataFrame:
    """Stack each wide pathology frame to long by its prefix→indicator map,
    then diagonal-concat the lot (pipeline.py:236-336)."""
    stacked = [
        stack_by_prefix(df, key_cols, prefix_map, indicator_col="Indicateur")
        for df, prefix_map in wides
    ]
    return union_relaxed(stacked)


def finalize_report(
    long_df: DataFrame,
    org_units: DataFrame,
    value_columns: list[str],
    ou_col: str = "organisation_unit_id",
    period_col: str = "period",
    root_uid: str = DEFAULT_ROOT_ORG_UNIT,
    org_levels: tuple[int, ...] = (3, 4),
) -> DataFrame:
    """Attach org paths, normalize idsite/periode, pad the always-present
    value columns, and emit the golden schema
    ``(idsite, periode, Indicateur, <value cols>)``
    (pipeline.py:338-365; SURVEY.md §1.4).
    """
    paths = org_units.filter(F.col("level").isin(list(org_levels))).select(
        F.col("id").alias("_ou_id"), F.col("path").alias("_path")
    )
    joined = long_df.join(
        F.broadcast(paths), long_df[ou_col] == F.col("_ou_id"), "left"
    )

    present = [c for c in long_df.columns if c in value_columns]
    all_values = present + [c for c in ALWAYS_PADDED_REPORT_COLUMNS if c not in present]
    contract = [
        ("idsite", T.StringType()),
        ("periode", T.DateType()),
        ("Indicateur", T.LongType()),
    ] + [(c, T.LongType()) for c in all_values]

    normalized = joined.select(
        idsite_from_path(F.col("_path"), root_uid).alias("idsite"),
        period_to_date(F.col(period_col)).alias("periode"),
        F.col("Indicateur").cast("long").alias("Indicateur"),
        *[round_to_long(F.col(c)).alias(c) for c in present],
    )
    return pad_to_contract(normalized, contract).orderBy(
        "idsite", "periode", "Indicateur"
    )
