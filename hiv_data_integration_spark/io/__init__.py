"""Sources and sinks (SURVEY.md §2.1 S1-S8, §2.2 K1-K3).

Parquet/CSV/JSON scans are plain ``spark.read`` (Catalyst handles pushdown
and pruning); this package adds the adapters Spark lacks natively: REST
fan-out ingestion (``rest``), Excel ingest with nested-header surgery
(``excel``), and the reference's sink shapes (``sinks``).
"""

from hiv_data_integration_spark.io import (  # noqa: F401
    excel,
    files,
    headers,
    rest,
    sinks,
)
