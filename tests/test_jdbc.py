"""JDBC staging edge (S7/S8) against embedded Derby."""

import pyspark.sql.functions as F

from bcg_contacts_data_pipeline_spark.io import jdbc as J

SF = "/root/testdata/sf0.001"


def test_roundtrip_exact(spark):
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    url = J.scratch_derby_url("test_roundtrip")
    J.write_jdbc(sup, url, "sup_rt", num_partitions=1)
    back = J.read_jdbc(spark, url, "sup_rt")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, sup.collect())
    )


def test_partitioned_read_covers_all_rows(spark):
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    url = J.scratch_derby_url("test_part")
    J.write_jdbc(sup, url, "sup_part")
    hi = sup.agg(F.max("s_suppkey")).first()[0]
    back = J.read_jdbc(
        spark, url, "sup_part",
        partition_column="s_suppkey", lower_bound=0,
        upper_bound=int(hi) + 1, num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == sup.count()


def test_filter_pushdown(spark):
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    url = J.scratch_derby_url("test_push")
    J.write_jdbc(sup, url, "sup_push")
    filt = J.read_jdbc(spark, url, "sup_push").filter(F.col("s_nationkey") < 13)
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(s_nationkey,13)" in plan
    want = sup.filter(F.col("s_nationkey") < 13).count()
    assert filt.count() == want


def test_overwrite_mode_replaces(spark):
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    url = J.scratch_derby_url("test_ovw")
    J.write_jdbc(sup.limit(5), url, "sup_ovw")
    J.write_jdbc(sup.limit(3), url, "sup_ovw", mode="overwrite")
    assert J.read_jdbc(spark, url, "sup_ovw").count() == 3
