"""bcg_contacts_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine providing the query and data-processing
capabilities of the reference contact-unification pipeline
(shafinislam2651/BCG-contacts-data-pipeline), re-expressed as composable
DataFrame -> DataFrame operators that scale to a multi-executor cluster:

- ``functions``  — the scalar normalization/text/vector expression library
  (no Python UDFs in any hot path; everything compiles to Catalyst
  expressions inside whole-stage codegen).
- ``operators``  — dedup-merge, k-of-n enrichment join, validation rule
  engine, similarity search (MinHash-LSH / SimHash / n-gram Jaccard /
  embedding cosine), as-of & range joins, multimodal column plumbing.
- ``io``         — TSV / headerless-TSV / Parquet / JDBC readers and
  writers plus the column-synonym source registry.
- ``plans``      — pipeline stage composition (the reference's run.py as a
  single lazily-composed Catalyst plan instead of file handoffs).
- ``streaming``  — Structured Streaming variants (watermarked dedup,
  windowed aggregation).
"""

from bcg_contacts_data_pipeline_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
