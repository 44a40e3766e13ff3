"""write_bucketed: co-located joins must not shuffle.

The 100 TB contract under test: two tables bucketed on the same key
with the same bucket count join with NO Exchange on either side — the
hash clustering done at write time satisfies the join's distribution
requirement at read time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bcg_contacts_data_pipeline_spark.io.writers import write_bucketed


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("b")
    )
    write_bucketed(left, "t_bkt_left", str(tmp_path / "l"), ["k"], 4, ["k"])
    write_bucketed(right, "t_bkt_right", str(tmp_path / "r"), ["k"], 4, ["k"])
    yield "t_bkt_left", "t_bkt_right"
    spark.sql("DROP TABLE IF EXISTS t_bkt_left")
    spark.sql("DROP TABLE IF EXISTS t_bkt_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    lname, rname = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(lname).join(spark.table(rname), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correct_results(spark, bucketed_pair):
    lname, rname = bucketed_pair
    got = (
        spark.table(lname)
        .join(spark.table(rname), "k")
        .agg(F.sum("k").alias("s"))
        .first()["s"]
    )
    assert got == sum(range(500))


def test_plain_path_read_still_works(spark, bucketed_pair, tmp_path):
    """Bucket metadata lives in the catalog; the files stay plain parquet."""
    df = spark.read.parquet(str(tmp_path / "l"))
    assert df.count() == 1000
