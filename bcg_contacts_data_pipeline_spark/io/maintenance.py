"""Lake maintenance: the jobs that keep a 100 TB parquet lake healthy
between queries.

- ``compact_parquet`` — small-files compaction. Streaming sinks,
  per-batch foreachBatch writers, and over-parallel jobs leave
  directories of KB-sized files; every downstream scan then pays one
  task + one open + one footer parse PER FILE (a million-file day
  partition is a scheduler outage, not a dataset). Compaction rewrites
  a directory to ~target-sized files.
- ``read_evolved`` — schema-evolution read. Landing zones accumulate
  files written under different schema versions (columns added over
  time); ``mergeSchema`` unions the versions, with absent columns NULL
  — the read-side contract that lets writers evolve without a
  stop-the-world rewrite.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    sort_within: list[str] | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` into approximately
    ``size / target_file_mb`` files (minimum 1) and return the new file
    count. ``sort_within`` re-clusters rows during the rewrite (same
    row-group-stats contract as ``writers.write_columnar``) — compaction
    is the natural moment to fix ordering, since the data is being
    rewritten anyway.

    The rewrite goes through a temp directory then an atomic-enough
    directory swap (rename), so a reader that raced the compaction saw
    either the old files or the new ones — never a half-written mix.
    On a real object store use a table format's commit protocol
    instead; the POSIX rename is the local/NFS equivalent.
    """
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    if sort_within:
        df = df.repartition(n_out).sortWithinPartitions(*sort_within)
    else:
        df = df.coalesce(n_out) if n_out < len(files) else df.repartition(n_out)

    tmp = path.rstrip("/") + ".__compact__"
    df.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".__old__"
    os.rename(path, old)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(old)
    return len(glob.glob(os.path.join(path, "*.parquet")))


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory whose files were written under EVOLVING schemas:
    ``mergeSchema`` unions the per-file schemas (by name), columns
    absent in older files come back NULL. Cost note: schema merging
    reads every file's footer up front — fine for a landing zone,
    wasteful on a curated table whose schema is known; there, declare
    the schema and skip the merge."""
    return spark.read.option("mergeSchema", "true").parquet(path)
