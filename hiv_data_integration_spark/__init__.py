"""PySpark-native analytics engine with the data-processing capabilities of
the ``aanoble/hiv-data-integration`` reference pipelines.

The reference (read-only at ``/root/reference``) is a single-node Polars ETL
system; this package re-expresses its operator inventory (SURVEY.md §2) as a
library of composable, Catalyst-friendly PySpark operators designed for
cluster-scale execution:

- ``session``    — SparkSession factory (AQE, Arrow, deterministic timezone)
- ``functions``  — scalar expression library (native Column expressions
                   replacing the reference's row-wise ``map_elements`` UDFs)
- ``operators``  — relational / aggregate / reshape / rules / fuzzy /
                   dedup / similarity / text / multimodal operators
- ``sources``    — file + REST ingestion adapters
- ``sinks``      — partitioned CSV, parquet state upsert, Excel review sink
- ``plans``      — pipeline DAGs reproducing the reference entry points
- ``streaming``  — Structured Streaming counterparts for the events table
"""

__version__ = "0.1.0"
