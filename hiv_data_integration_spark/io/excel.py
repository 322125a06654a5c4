"""Excel ingest: sheet scan + two-row nested-header flattening.

Reference semantics (S3 + R4op):

- sheet discovery / typed sheet read — ``update_pnls_report/
  extract_chu_data.py:36,182`` (polars ``read_excel`` + pandas
  ``ExcelFile``).
- two-row nested-header flatten — ``update_pnls_report/
  extract_chu_data.py:213-242``: header columns named ``__UNNAMED__*``
  inherit the last explicitly-named ancestor column, suffixed with the
  age/sex labels found in the first two data rows, producing
  ``<indicator>_<age>_<sex>`` wide names; the two label rows are then
  dropped.

Spark design: CHU workbooks are small per-hospital review files, so the
byte parsing is **driver-side** (openpyxl when available, gated import) and
the result enters the engine via ``spark.createDataFrame`` — distributed
processing starts at the DataFrame boundary. The header surgery itself is
pure-Python column-name logic, fully testable without any Excel library.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "HAVE_OPENPYXL",
    "flatten_two_row_header",
    "read_excel_sheet",
    "excel_sheet_to_spark",
]

try:  # pragma: no cover - openpyxl absent in this container
    import openpyxl  # noqa: F401

    HAVE_OPENPYXL = True
except ImportError:
    HAVE_OPENPYXL = False

_UNNAMED_MARKERS = ("__UNNAMED__", "Unnamed:")


def _is_unnamed(col: str) -> bool:
    return any(str(col).startswith(m) for m in _UNNAMED_MARKERS)


def flatten_two_row_header(pdf: pd.DataFrame) -> pd.DataFrame:
    """Flatten a two-row nested header into flat ``parent_label0_label1``
    column names and drop the two label rows.

    Input contract (matching the reference's post-read shape): the frame's
    columns carry the top header row (with ``__UNNAMED__``/``Unnamed:``
    placeholders under merged cells), and data rows 0-1 carry the two
    sub-header label rows. Named columns keep their name; unnamed columns
    get ``<last_named_ancestor>_<row0_label>_<row1_label>`` (labels that
    are missing/NaN are skipped).
    """
    if len(pdf) < 2:
        raise ValueError("expected >= 2 label rows before data")
    labels0 = pdf.iloc[0]
    labels1 = pdf.iloc[1]

    new_cols: list[str] = []
    ancestor: str | None = None
    for col in pdf.columns:
        col_s = str(col)
        if not _is_unnamed(col_s):
            ancestor = col_s.strip()
            parts: list[Any] = [ancestor]
        else:
            parts = [ancestor if ancestor is not None else "col"]
        for lab in (labels0[col], labels1[col]):
            if lab is not None and not (isinstance(lab, float) and pd.isna(lab)):
                s = str(lab).strip()
                if s:
                    parts.append(s)
        new_cols.append("_".join(str(p) for p in parts))

    out = pdf.iloc[2:].reset_index(drop=True).copy()
    out.columns = new_cols
    return out


def read_excel_sheet(path: str, sheet_name: str | int = 0) -> pd.DataFrame:
    """Read one worksheet into pandas (driver-side).

    Gated on openpyxl: this container ships no Excel library, so the byte
    parsing raises a clear NotImplementedError here; every downstream
    operator (header flatten, fuzzy org matching, lenient numeric parse)
    is exercised through pandas/Spark fixtures instead.
    """
    if not HAVE_OPENPYXL:  # pragma: no cover - exercised via message test
        raise NotImplementedError(
            "Excel byte parsing needs openpyxl (not shipped in this "
            "container); construct a pandas DataFrame fixture and use "
            "flatten_two_row_header / excel_sheet_to_spark directly."
        )
    return pd.read_excel(path, sheet_name=sheet_name)  # pragma: no cover


def excel_sheet_to_spark(
    spark: SparkSession,
    pdf: pd.DataFrame,
    flatten_nested_header: bool = False,
) -> DataFrame:
    """Driver-side pandas sheet → distributed DataFrame (the engine
    boundary for Excel sources). All-object pandas columns are stringified
    so Spark infers a stable schema from ragged Excel input."""
    if flatten_nested_header:
        pdf = flatten_two_row_header(pdf)
    pdf = pdf.copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda x: None if pd.isna(x) else str(x))
    return spark.createDataFrame(pdf)
