"""The pathology-extract spine — the chain every reference extract repeats.

Reference shape (``update_pnls_report/extract_ist_data.py:15-169``, repeated
with small deltas by PEC/PTME/consultant extracts):

    long analytics fact
      → broadcast join COC dim (names)                 [J1]
      → broadcast join data-element map (indicator)    [J2]
      → canonicalize COC label, synthesize wide name   [D3/F6]
      → pivot wide                                     [A3/A4]
      → cast to double, grouped null-preserving sum    [A1]
      → pad to declared contract                       [R3op]

Scale notes: both dims are broadcast (tiny); the pivot gets its value list
from the declared contract so no distinct-scan job runs and the schema is
data-independent; the final aggregate is one partial+final hash shuffle on
(org unit, period) — the only shuffle in the spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hiv_data_integration_spark.constants import DEFAULT_COC_UID
from hiv_data_integration_spark.functions import (
    canonicalize_coc_name,
    compound_key,
)
from hiv_data_integration_spark.operators.aggregate import pivot_agg
from hiv_data_integration_spark.operators.reshape import pad_to_contract

__all__ = ["pathology_extract"]


def pathology_extract(
    analytics: DataFrame,
    coc: DataFrame,
    de_map: DataFrame,
    contract_value_cols: list[str],
    keys: tuple[str, str] = ("organisation_unit_id", "period"),
    compound_coc_keys: bool = False,
    pivot_agg_fn: str = "min",
) -> DataFrame:
    """Run the extract spine for one pathology.

    Parameters
    ----------
    analytics : long fact ``(data_element_id, category_option_combo_id,
        organisation_unit_id, period, value)`` (io.rest.ANALYTICS_SCHEMA).
    coc : dim ``(id, name)``.
    de_map : dim ``(id, column, type)``; rows with ``type='data_element'``
        participate (the reference filters exactly so,
        extract_ist_data.py:46). With ``compound_coc_keys`` the map id may
        be ``"<de_uid>.<coc_uid>"`` (PTME variant,
        extract_ptme_data.py:68-90).
    contract_value_cols : declared wide columns (pivot value list + padding
        target), e.g. ``["indicateur_9_age_0_4_ans_M", ...]``.
    """
    ou, pe = keys
    de_map = de_map.filter(F.col("type") == "data_element").select(
        F.col("id").alias("map_id"), F.col("column").alias("indicator_column")
    )

    named = analytics.join(
        F.broadcast(coc.select(F.col("id").alias("coc_id"), F.col("name").alias("coc_name"))),
        analytics["category_option_combo_id"] == F.col("coc_id"),
        "left",
    )

    if compound_coc_keys:
        # PTME: map keys are "<de>.<coc>" except for the default COC, which
        # maps by bare data-element id (extract_ptme_data.py:68-80).
        join_key = F.when(
            F.col("category_option_combo_id") == DEFAULT_COC_UID,
            F.col("data_element_id"),
        ).otherwise(
            compound_key(F.col("data_element_id"), F.col("category_option_combo_id"))
        )
    else:
        join_key = F.col("data_element_id")

    mapped = named.withColumn("_jk", join_key).join(
        F.broadcast(de_map), F.col("_jk") == F.col("map_id"), "left"
    )

    # Wide name: "<indicator_column>_<canonical_coc>"; the default/sexless
    # COC contributes no suffix.
    suffix = canonicalize_coc_name(F.col("coc_name"))
    wide_name = F.when(
        F.col("coc_name").isNull() | (F.col("coc_name") == "default"),
        F.col("indicator_column"),
    ).otherwise(F.concat_ws("_", F.col("indicator_column"), suffix))

    long_named = (
        mapped.filter(F.col("indicator_column").isNotNull())
        .select(
            F.col(ou),
            F.col(pe),
            wide_name.alias("column_name"),
            F.col("value").cast("double").alias("value"),
        )
    )

    wide = pivot_agg(
        long_named,
        keys=[ou, pe],
        pivot_col="column_name",
        value_col="value",
        values=contract_value_cols,
        agg=pivot_agg_fn,
    )

    # no re-aggregation here: pivot_agg already grouped by (ou, pe), so
    # its output is unique per key — the reference's post-pivot re-sum
    # (A1) exists to collapse its concat of per-indicator frames, which
    # this single-pivot formulation never produces
    contract = [(ou, T.StringType()), (pe, T.StringType())] + [
        (c, T.DoubleType()) for c in contract_value_cols
    ]
    return pad_to_contract(wide, contract)
