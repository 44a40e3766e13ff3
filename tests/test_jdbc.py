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


def test_partitioned_read_issues_n_bounded_queries(spark):
    """The parallel read must be N bounded remote queries, not N copies
    of the table — audited from the JDBCRelation's own partition WHERE
    clauses (what each executor task sends to the database), plus the
    physical placement: every Spark partition holds only keys of its
    bound range. Stride semantics (Spark): partition i of [lo, hi) with
    N partitions covers [lo + i*stride, lo + (i+1)*stride), the first
    also takes < lo and NULLs, the last is unbounded above."""
    sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    url = J.scratch_derby_url("bounds_audit")
    J.write_jdbc(sup, url, "sup_bounds", num_partitions=1)
    df = J.read_jdbc(
        spark, url, "sup_bounds",
        partition_column="s_suppkey", lower_bound=0,
        upper_bound=101, num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4

    parts = df._jdf.queryExecution().analyzed().relation().parts()
    clauses = {p.idx(): p.whereClause() for p in parts}
    assert len(clauses) == 4
    assert '"s_suppkey" < 26' in clauses[0] and "is null" in clauses[0]
    assert clauses[1] == '"s_suppkey" >= 26 AND "s_suppkey" < 51'
    assert clauses[2] == '"s_suppkey" >= 51 AND "s_suppkey" < 76'
    assert clauses[3] == '"s_suppkey" >= 76'

    # physical placement matches the audited clauses
    got = {
        (r["p"], r["lo"], r["hi"])
        for r in df.select(
            F.spark_partition_id().alias("p"), F.col("s_suppkey")
        )
        .groupBy("p")
        .agg(F.min("s_suppkey").alias("lo"), F.max("s_suppkey").alias("hi"))
        .collect()
    }
    for p, lo, hi in got:
        if p == 1:
            assert lo >= 26 and hi < 51
        elif p == 2:
            assert lo >= 51 and hi < 76
        elif p == 3:
            assert lo >= 76

    # pushdown composes with partitioning: a filter on the partitioned
    # read reaches the remote queries as PushedFilters
    plan = (
        df.filter(F.col("s_acctbal") > 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "s_acctbal" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
