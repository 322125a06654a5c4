"""Reshaping operators: wide↔long stacking, schema contracts, renames.

Maps SURVEY.md §2.9 (R1op-R4op). These are the reference's workhorse ops:
``transform_for_pnls_reporting`` (update_pnls_report/utils.py:214-249),
schema padding to declared contracts (extract_ist_data.py:156-169), and
rename maps. All are pure plan rewrites — Catalyst collapses the per-prefix
select/union loop into one plan, so "loop over indicators" costs nothing
extra at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hiv_data_integration_spark.functions import standardize_column_name
from hiv_data_integration_spark.operators.relational import union_relaxed

__all__ = [
    "stack_by_prefix",
    "pad_to_contract",
    "rename_columns",
    "unpivot_long",
]


def stack_by_prefix(
    df: DataFrame,
    key_cols: list[str],
    prefix_to_indicator: Mapping[str, str | int],
    name_standardizer: Callable[[str], str] = standardize_column_name,
    indicator_col: str = "indicateur",
) -> DataFrame:
    """Wide→long stack by indicator prefix (R1op).

    Re-expression of ``transform_for_pnls_reporting``
    (update_pnls_report/utils.py:214-249): for each (column-prefix →
    indicator id), select the key columns plus all columns starting with the
    prefix, tag a literal indicator id, canonicalize the value-column names
    (age/sex), and union the per-indicator frames by name with relaxation.

    When two source columns standardize to the same canonical name within
    one prefix group they are summed (the reference relies on polars rename
    uniqueness; we make the merge explicit and deterministic).
    """
    pieces: list[DataFrame] = []
    for prefix, indicator in prefix_to_indicator.items():
        value_cols = [c for c in df.columns if c.startswith(prefix)]
        if not value_cols:
            continue
        canonical: dict[str, list[str]] = {}
        for c in value_cols:
            canonical.setdefault(name_standardizer(c), []).append(c)
        exprs = [F.col(k) for k in key_cols]
        exprs.append(F.lit(indicator).alias(indicator_col))
        for new_name, sources in canonical.items():
            if len(sources) == 1:
                exprs.append(F.col(sources[0]).alias(new_name))
            else:
                merged = sources[0]
                summed = F.col(merged)
                for s in sources[1:]:
                    summed = (
                        F.coalesce(summed, F.lit(0)) + F.coalesce(F.col(s), F.lit(0))
                    )
                exprs.append(summed.alias(new_name))
        pieces.append(df.select(*exprs))
    if not pieces:
        raise ValueError("no prefix matched any column")
    return union_relaxed(pieces)


def pad_to_contract(
    df: DataFrame,
    contract: list[tuple[str, T.DataType]] | T.StructType,
    keep_extra: bool = False,
) -> DataFrame:
    """Force a DataFrame onto a declared column contract (R3op).

    Missing columns become typed NULL literals; output column order is the
    contract order (reference: DICO_EXPECTED_COLUMNS padding at
    update_pnls_report/extract_ist_data.py:156-169 and the always-padded
    report columns at pipeline.py:359-365).
    """
    if isinstance(contract, T.StructType):
        contract = [(f.name, f.dataType) for f in contract.fields]
    existing = set(df.columns)
    cols = [
        F.col(name).cast(dtype).alias(name)
        if name in existing
        else F.lit(None).cast(dtype).alias(name)
        for name, dtype in contract
    ]
    if keep_extra:
        declared = {name for name, _ in contract}
        cols += [F.col(c) for c in df.columns if c not in declared]
    return df.select(*cols)


def rename_columns(
    df: DataFrame, mapping: Mapping[str, str] | Callable[[str], str]
) -> DataFrame:
    """Rename via map or function (R2op; reference ``.rename({...})`` /
    ``.rename(lambda c: ...)``, extract_ist_data.py:101,126)."""
    if callable(mapping):
        mapping = {c: mapping(c) for c in df.columns}
    return df.withColumnsRenamed(dict(mapping))


def unpivot_long(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long melt via native ``unpivot`` (inverse of pivot_agg; engine
    extension used by the text/report paths)."""
    value_cols = value_cols or [c for c in df.columns if c not in key_cols]
    return df.unpivot(key_cols, value_cols, var_name, value_name)
