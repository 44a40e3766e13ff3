"""SparkSession factory + test-table loading.

Configured for scale-out from day one: AQE (adaptive coalescing + skew-join
splitting) on, Arrow for the few pandas-UDF paths, UTC session timezone so
timestamp semantics are stable across engines, and a shuffle-partition
default sized for the local harness but overridable per-deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(
    app_name: str = "bcg-contacts-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    On the local harness we run ``local[$SPARK_GRAFT_CPUS]``; on a real
    cluster the master/shuffle settings come from spark-submit and only the
    semantic configs below matter.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    # cloudpickle serializes package-level UDFs (the mapInPandas media /
    # similarity kernels) BY REFERENCE, so the Python workers must be able
    # to import this package. When running from a repo checkout that's only
    # true if the driver happens to cwd at the repo root (python -m
    # pyspark.daemon picks up cwd) — put the package parent on PYTHONPATH
    # explicitly so a driver launched from any directory still works. Must
    # happen before the gateway JVM starts (workers inherit its env).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pypath}" if pypath else pkg_root
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive execution: runtime partition coalescing + skew-join
        # splitting (the empty-dedup-key hazard in SURVEY §4 is exactly the
        # skew AQE handles).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas-UDF boundaries (similarity / multimodal paths).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics for the DuckDB oracle compare.
        .config("spark.sql.session.timeZone", "UTC")
        # local[] has no separate executors; give the single JVM room.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the harness parquet tables; optionally register temp views.

    Reads go through the static-schema catalog (io/schemas.py) where a
    table is declared — no per-table footer-inference job — and plain
    ``spark.read.parquet`` otherwise; Catalyst keeps pushdown/pruning
    either way, and no caching happens here — callers cache only what
    they reuse.
    """
    from bcg_contacts_data_pipeline_spark.io.schemas import read_table

    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
