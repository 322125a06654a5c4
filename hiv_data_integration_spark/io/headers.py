"""Driver-side fuzzy header resolution for ragged source columns.

Reference semantics (update_pnls_report/utils.py:434-459, 517-540 and the
CHU sheet surgery at extract_chu_data.py:182-208):

- ``find_best_match`` — exact position of a label in a list, else the
  token-set fuzzy best match at a >= 95 threshold;
- ``rename_or_drop_column_if_found`` — try each candidate label against the
  frame's columns; first hit is renamed to the target (or dropped);
- ``SHEET_RENAMES`` application — each sheet's long French indicator labels
  fuzzy-resolve to their ``indicateur_N`` column.

All of this is PLAN-TIME logic over ``df.columns`` — zero data movement, so
"driver-side" is the right altitude at any scale; the distributed plan only
ever sees the final canonical names.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame

from hiv_data_integration_spark.operators.fuzzy import (
    strip_accents,
    token_set_ratio,
)

__all__ = [
    "find_best_match_index",
    "resolve_sheet_name",
    "rename_or_drop_if_found",
    "apply_sheet_renames",
    "standardize_chu_columns",
    "clean_chu_cells",
]


def _norm_label(s: str) -> str:
    return strip_accents(str(s)).strip().lower()


def find_best_match_index(
    element: str, values: list[str], threshold: float = 95.0
) -> int | None:
    """Index of ``element`` in ``values``: exact hit first, else the best
    token-set fuzzy score >= ``threshold`` (utils.py:434-459). Returns None
    when nothing clears the bar."""
    if element in values:
        return values.index(element)
    q = _norm_label(element)
    best_i, best_s = None, threshold
    for i, v in enumerate(values):
        s = token_set_ratio(q, _norm_label(v))
        if s > best_s or (s == best_s and best_i is None):
            best_i, best_s = i, s
    return best_i


def resolve_sheet_name(
    sheet_name: str, sheetnames: list[str], threshold: float = 95.0
) -> str:
    """Fuzzy sheet discovery (extract_chu_data.py:175-182): the requested
    sheet resolves to the workbook's closest actual sheet name, raising
    with the available names when nothing clears the bar."""
    idx = find_best_match_index(sheet_name, sheetnames, threshold)
    if idx is None:
        raise ValueError(
            f"sheet {sheet_name!r} not found; available: {sheetnames}"
        )
    return sheetnames[idx]


def rename_or_drop_if_found(
    df: DataFrame,
    target: str,
    candidates: list[str],
    drop: bool = False,
    threshold: float = 95.0,
) -> tuple[DataFrame, bool]:
    """First candidate label that fuzzy-resolves to a column wins: the
    column is renamed to ``target`` (or dropped). Returns ``(df, found)``
    (utils.py:517-540)."""
    for label in candidates:
        idx = find_best_match_index(label, df.columns, threshold)
        if idx is not None:
            col = df.columns[idx]
            if drop:
                return df.drop(col), True
            return df.withColumnRenamed(col, target), True
    return df, False


def apply_sheet_renames(
    df: DataFrame,
    renames: Mapping[str, str],
    threshold: float = 95.0,
) -> DataFrame:
    """Apply one sheet's label→indicator map (the shipped ``SHEET_RENAMES``
    blocks, reference constants.py:156-175) with fuzzy label resolution
    (extract_chu_data.py:197-201). Labels that resolve to no column are
    skipped, like the reference."""
    for orig, new in renames.items():
        idx = find_best_match_index(orig, df.columns, threshold)
        if idx is not None:
            df = df.withColumnRenamed(df.columns[idx], new)
    return df


def standardize_chu_columns(
    df: DataFrame,
    sheet_name: str | None = None,
    sheet_renames: Mapping[str, Mapping[str, str]] | None = None,
) -> tuple[DataFrame, bool]:
    """The CHU sheet's special-column surgery (extract_chu_data.py:185-201):
    drop region/service, canonicalize district/facility/period headers, then
    apply the sheet's indicator renames. Returns ``(df, district_present)``.
    """
    if sheet_renames is None:
        from hiv_data_integration_spark.ref_constants import SHEET_RENAMES

        sheet_renames = SHEET_RENAMES
    df = df.toDF(*[str(c).strip() for c in df.columns])
    df, _ = rename_or_drop_if_found(df, "regions", ["Région", "région"], drop=True)
    df, district_here = rename_or_drop_if_found(
        df, "districts_sanitaires", ["Districts", "districts"]
    )
    df, _ = rename_or_drop_if_found(
        df, "formations_sanitaires", ["Formations sanitaires", "Etablissements"]
    )
    df, _ = rename_or_drop_if_found(df, "service", ["Service", "service"], drop=True)
    df, _ = rename_or_drop_if_found(df, "periode", ["Mois"])
    if sheet_name and sheet_name in sheet_renames:
        df = apply_sheet_renames(df, sheet_renames[sheet_name])
    return df, district_here


def clean_chu_cells(
    df: DataFrame,
    replacements: Mapping[str, str] | None = None,
    org_cols: tuple[str, ...] = ("districts_sanitaires", "formations_sanitaires"),
    skip_cols: tuple[str, ...] = ("periode",),
) -> DataFrame:
    """The CHU sheet's cell cleanup (extract_chu_data.py:203-211): org-unit
    columns get trimmed; every other string column runs the age-label
    ``multi_replace`` canonicalization (the same ordered literal
    replacements used for COC names). Numeric columns pass through.

    Native ``replace``/``trim`` projections — the reference's per-cell
    ``map_elements`` loop becomes one codegen'd select.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from hiv_data_integration_spark.functions import multi_replace

    if replacements is None:
        from hiv_data_integration_spark.ref_constants import (
            COLUMN_NAME_GROUP_AGE,
        )

        replacements = COLUMN_NAME_GROUP_AGE
    cols = []
    for f in df.schema.fields:
        if f.name in org_cols and isinstance(f.dataType, T.StringType):
            cols.append(F.trim(F.col(f.name)).alias(f.name))
        elif (
            isinstance(f.dataType, T.StringType) and f.name not in skip_cols
        ):
            cols.append(multi_replace(F.col(f.name), replacements).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
