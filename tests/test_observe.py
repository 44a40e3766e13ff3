"""Observation-API metrics: stats ride the materializing job — no
second scan (the reference's between-stage stat prints, Spark-native)."""

import pyspark.sql.functions as F

from bcg_contacts_data_pipeline_spark.operators.observe import with_metrics


def test_metrics_ride_the_write_job(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 7 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("u"), F.col("id"), F.lit("@x.io")))
        .alias("email"),
    )
    observed, obs = with_metrics(
        df,
        {
            "rows": F.count(F.lit(1)),
            "null_email": F.sum(
                F.when(F.col("email").isNull(), 1).otherwise(0)
            ),
            "max_id": F.max("id"),
        },
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["rows"] == 1000
    assert got["null_email"] == 143  # ids 0,7,...,994
    assert got["max_id"] == 999

    # the metrics really cost no extra scan: ONE parquet/range source in
    # the executed plan, no second job was needed to read stats
    plan = observed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range") == 1
    assert "CollectMetrics" in plan


def test_metrics_reflect_filtered_action(spark):
    """Metrics report what the OBSERVING action processed: attach below
    a filter, materialize, and the counts match the filtered stream."""
    df = spark.range(100).select(F.col("id"))
    observed, obs = with_metrics(
        df.filter(F.col("id") >= 50), {"n": F.count(F.lit(1))}
    )
    assert observed.count() == 50
    assert obs.get["n"] == 50


def test_metrics_require_nonempty(spark):
    import pytest

    with pytest.raises(ValueError, match="at least one named metric"):
        with_metrics(spark.range(1), {})
