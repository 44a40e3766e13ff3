"""Lake maintenance: small-files compaction and schema-evolution reads."""

import glob
import os

import pyspark.sql.functions as F
import pytest

from bcg_contacts_data_pipeline_spark.io.maintenance import (
    compact_parquet,
    read_evolved,
)


def test_compaction_reduces_files_and_preserves_content(spark, tmp_path):
    path = str(tmp_path / "lake")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 17).cast("double").alias("v")
    )
    df.repartition(64).write.parquet(path)  # the small-files mess
    before = glob.glob(os.path.join(path, "*.parquet"))
    assert len(before) == 64

    n_after = compact_parquet(spark, path, target_file_mb=256)
    assert n_after < len(before)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == df.agg(
        F.sum("v")
    ).collect()[0][0]
    # no leftover temp/old directories
    assert not glob.glob(str(tmp_path / "lake.__*"))


def test_compaction_with_sort_within_gives_ordered_row_groups(
    spark, tmp_path
):
    import pyarrow.parquet as pq

    path = str(tmp_path / "lake2")
    spark.range(50_000).select(
        F.xxhash64("id").alias("k")
    ).repartition(16).write.parquet(path)
    compact_parquet(spark, path, target_file_mb=256, sort_within=["k"])
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        kix = md.schema.names.index("k")
        ranges = [
            (
                md.row_group(i).column(kix).statistics.min,
                md.row_group(i).column(kix).statistics.max,
            )
            for i in range(md.num_row_groups)
        ]
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a0 <= a1 <= b0 <= b1


def test_compaction_requires_existing_files(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        compact_parquet(spark, str(tmp_path / "nope"))


def test_schema_evolution_read(spark, tmp_path):
    """Old files lack the column newer files carry: mergeSchema unions
    by name, missing values are NULL, and both eras' rows survive."""
    path = str(tmp_path / "landing")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    got = {r.id: r for r in read_evolved(spark, path).collect()}
    assert set(read_evolved(spark, path).columns) == {"id", "name", "score"}
    assert got[1].score is None
    assert got[2].score == 9.5
