"""Runtime row/partition filtering — the two optimizer features that
decide whether a selective dim join reads 100 TB or 1 TB:

- Dynamic Partition Pruning (DPP): a filter on the dimension side is
  turned into a runtime IN-subquery on the fact's PARTITION column, so
  the fact scan opens only matching directories.
- Runtime Bloom-filter join pruning: for non-partition join keys, a
  bloom filter built from the (filtered) build side is pushed into the
  probe scan, dropping rows before the shuffle.

Both are free if the plan stays declarative — these tests pin that our
session config + write layout actually trigger them.
"""

import pyspark.sql.functions as F


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    from bcg_contacts_data_pipeline_spark.io.writers import write_columnar

    fact = spark.range(20_000).select(
        F.col("id"),
        (F.col("id") % 20).alias("region_id"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    path = str(tmp_path / "fact_by_region")
    write_columnar(fact, path, partition_by=["region_id"])

    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(20)],
        "region_id long, tag string",
    )
    back = spark.read.parquet(path)
    joined = (
        back.join(dim, "region_id")
        .filter(F.col("tag") == "keep")
        .groupBy("region_id")
        .agg(F.sum("v").alias("sv"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan or "DynamicPruning" in plan, plan
    rows = joined.collect()
    assert {r.region_id for r in rows} == {0, 1}
    # correctness: equals the unpartitioned computation
    want = {
        r.region_id: r.sv
        for r in fact.filter(F.col("region_id") < 2)
        .groupBy("region_id")
        .agg(F.sum("v").alias("sv"))
        .collect()
    }
    assert {r.region_id: r.sv for r in rows} == want


def test_runtime_bloom_filter_prunes_probe_side(spark, tmp_path):
    """Non-partition join key + selective build-side filter: with the
    runtime bloom filter enabled and thresholds lowered to toy scale,
    the probe scan gains a might_contain filter fed by the build side."""
    fact = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).cast("double").alias("v")
    )
    dim = spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    fpath, dpath = str(tmp_path / "fact"), str(tmp_path / "dim")
    fact.write.parquet(fpath)
    dim.write.parquet(dpath)

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force a shuffle join so the bloom filter has a reason to exist
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        f = spark.read.parquet(fpath)
        d = spark.read.parquet(dpath).filter(F.col("grp") == 3)
        joined = f.join(d, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        got = joined.collect()[0]
        # exact correctness vs no-bloom run
        want = (
            fact.join(dim.filter(F.col("grp") == 3), "k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .collect()[0]
        )
        assert (got.n, got.sv) == (want.n, want.sv)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
