"""Salted aggregation/join: semantics identical to unsalted, shuffle
reshaped."""

import pyspark.sql.functions as F

from bcg_contacts_data_pipeline_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_equals_plain(spark):
    df = spark.range(0, 10000).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
        .otherwise(F.col("id").cast("string"))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    got = {
        r.k: (r.n, r.total, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": (F.count, F.sum, F.lit(1)),
                "total": (F.sum, F.sum, F.col("v")),
                "mx": (F.max, F.max, F.col("v")),
            },
        ).collect()
    }
    want = {
        r.k: (r.n, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6
        assert got[k][2] == want[k][2]


def test_salted_join_equals_plain(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("fid")
    )
    dim = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dval")
    )
    got = sorted(
        map(tuple, salted_join(fact, dim, "k").select("fid", "dval").collect())
    )
    want = sorted(
        map(tuple, fact.join(dim, "k").select("fid", "dval").collect())
    )
    assert got == want


def test_salted_agg_spreads_hot_key(spark):
    """The phase-1 grouping must actually spread the hot key: with 16
    salts and 5000 HOT rows, phase-1 produces >1 partial for HOT."""
    df = spark.range(0, 5000).select(
        F.lit("HOT").alias("k"), F.col("id").cast("double").alias("v")
    )
    salted = df.withColumn("__salt", (F.rand(seed=7) * 16).cast("int"))
    n_partials = salted.groupBy("k", "__salt").count().count()
    assert n_partials > 8
