"""Pipeline DAGs reproducing the reference's three entry points
(SURVEY.md §3) as compositions of the operator library:

- A — consolidated DHIS2 + NAOMI report (``update_pnls_report/pipeline.py``)
- B — Spectrum-file variant (``update_pnls_report_with_spectrum_path/``)
- C — CHU Excel ingestion (``update_pnls_report/extract_chu_data.py``)

Everything here is plan construction: each pipeline returns DataFrames; the
caller picks sinks (CSV per period, parquet state, Excel review).
"""

from hiv_data_integration_spark.pipeline.extract import pathology_extract
from hiv_data_integration_spark.pipeline.pnls import (
    run_pipeline_a,
    run_pipeline_b,
    run_pipeline_c,
)
from hiv_data_integration_spark.pipeline.report import (
    REPORT_KEY_COLUMNS,
    finalize_report,
    stack_pathologies,
)

__all__ = [
    "pathology_extract",
    "stack_pathologies",
    "finalize_report",
    "REPORT_KEY_COLUMNS",
    "run_pipeline_a",
    "run_pipeline_b",
    "run_pipeline_c",
]
