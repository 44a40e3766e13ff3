"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``bcg_contacts_data_pipeline_spark.plans.queries`` — the
registry of every implemented operator from SURVEY.md §2 plus the
LLM-data-pipeline extensions, each paired with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bcg_contacts_data_pipeline_spark.plans.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the complete contact-unification pipeline (k-of-n
    enrichment fill -> field cleaning -> most-complete-record dedup ->
    validation) end-to-end as one Spark plan at sf0.001."""
    return QUERIES["contacts_pipeline_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
