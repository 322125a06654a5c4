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
from hiv_data_integration_spark.operators.relational import (
    _common_supertype,
    union_relaxed,
)

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

    Planned as ONE pass: per input row, an ``explode`` over an array of
    per-indicator structs. The per-prefix select + union formulation reads
    identically but plans the entire upstream (scan → joins → pivot → agg)
    once per prefix — Spark does not reuse the duplicated subtrees, which
    tripled the flagship pipeline's execution. Missing columns pad with
    typed NULLs and shared columns are cast to their least common supertype,
    exactly like ``union_relaxed``; output column order is first-seen order
    across prefix groups (= unionByName order).
    """
    # per-prefix expression dicts: output name -> unaliased Column
    groups: list[dict[str, F.Column]] = []
    for prefix, indicator in prefix_to_indicator.items():
        value_cols = [c for c in df.columns if c.startswith(prefix)]
        if not value_cols:
            continue
        canonical: dict[str, list[str]] = {}
        for c in value_cols:
            canonical.setdefault(name_standardizer(c), []).append(c)
        cols: dict[str, F.Column] = {indicator_col: F.lit(indicator)}
        for new_name, sources in canonical.items():
            if len(sources) == 1:
                cols[new_name] = F.col(sources[0])
            else:
                # null-preserving merge: nulls count as 0 only if at least
                # one source is non-null; an all-NULL set stays NULL (same
                # invariant as grouped_sum / SQL SUM)
                summed = F.coalesce(F.col(sources[0]), F.lit(0))
                any_set = F.col(sources[0]).isNotNull()
                for s in sources[1:]:
                    summed = summed + F.coalesce(F.col(s), F.lit(0))
                    any_set = any_set | F.col(s).isNotNull()
                cols[new_name] = F.when(any_set, summed)
        groups.append(cols)
    if not groups:
        raise ValueError("no prefix matched any column")

    # unified field set: first-seen order, least-common-supertype per name
    # (schema analysis only — no execution)
    field_order: list[str] = []
    field_type: dict[str, T.DataType] = {}
    for g in groups:
        schema = df.select(*[c.alias(n) for n, c in g.items()]).schema
        for f in schema.fields:
            if f.name not in field_type:
                field_order.append(f.name)
                field_type[f.name] = f.dataType
            else:
                field_type[f.name] = _common_supertype(
                    field_type[f.name], f.dataType
                )

    structs = [
        F.struct(
            *[
                (
                    g[n].cast(field_type[n])
                    if n in g
                    else F.lit(None).cast(field_type[n])
                ).alias(n)
                for n in field_order
            ]
        )
        for g in groups
    ]
    exploded = df.select(
        *[F.col(k) for k in key_cols],
        F.explode(F.array(*structs)).alias("_stk"),
    )
    return exploded.select(
        *key_cols, *[F.col(f"_stk.{n}").alias(n) for n in field_order]
    )


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
