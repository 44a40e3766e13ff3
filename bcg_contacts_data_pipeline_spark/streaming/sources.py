"""Streaming sources (green-field per SURVEY §2.9).

The reference is strictly batch; its closest analogues are the chunked
micro-batch ingest (fill_missing_contacts_large.py:47-66) and the
latest-file-by-mtime source (clean_contacts.py:239-245). Structured
Streaming's file source is the idiomatic Spark replacement for both: new
files in a directory become micro-batches, `maxFilesPerTrigger` bounds
batch size the way the 10k-row chunk did, and `Trigger.AvailableNow`
reproduces the "process everything currently present, then stop" batch
semantics deterministically (used by tests and the driver oracle).

At cluster scale the same code runs with a durable checkpoint location on
shared storage and a RocksDB state store
(`spark.sql.streaming.stateStore.providerClass`); nothing here assumes
local mode.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from bcg_contacts_data_pipeline_spark.io.events import normalize_event_ts


def stage_as_dir(path: str) -> str:
    """Spark's file-stream source requires a *directory* (basePath). Given a
    single data file, stage a stable symlink directory for it under the
    system temp dir. Given a directory, return it unchanged.

    The directory name is derived from the file path (not random) so
    repeated calls in one session reuse the same source and the file-stream
    offset log stays consistent.
    """
    if os.path.isdir(path):
        return path
    digest = hashlib.sha256(path.encode()).hexdigest()[:16]
    d = os.path.join(tempfile.gettempdir(), f"stream_src_{digest}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(path))
    if not os.path.lexists(link):
        os.symlink(path, link)
    return d


def file_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Schema-explicit streaming file source. Explicit schemas are mandatory
    for streaming reads (and good practice everywhere — SURVEY §1.2)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(stage_as_dir(path))


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of io.events.read_events: the events table as an
    unbounded source. The `ts` encoding logic is literally the same
    function (normalize_event_ts) as the batch path, so batch/stream
    parity cannot drift. The ``nanosAsLong`` conf is likewise only
    flipped when the footer actually declares TIMESTAMP(NANOS) — same
    session-hygiene rule as the batch reader."""
    from bcg_contacts_data_pipeline_spark.io.events import (
        set_nanos_conf_if_needed,
    )

    path = f"{sf_dir}/events.parquet"
    set_nanos_conf_if_needed(spark, path)
    schema = spark.read.parquet(path).schema
    raw = file_stream(spark, path, schema)
    return normalize_event_ts(raw)


def events_stream_duplicated(
    spark: SparkSession, sf_dir: str, copies: int = 2
) -> DataFrame:
    """The events stream with every event delivered ``copies`` times —
    the at-least-once source a streaming dedup exists for. Stages the
    events file N times (hard copies, stable digest-named dir so
    repeated calls reuse the same source) and reads the directory as
    one file stream; the consumer must collapse the replays (e.g.
    ``dropDuplicatesWithinWatermark`` on event_id) to recover
    exactly-once semantics. ``ts`` normalization is the shared
    ``normalize_event_ts``, same as every other events reader."""
    import shutil

    from bcg_contacts_data_pipeline_spark.io.events import (
        normalize_event_ts,
        set_nanos_conf_if_needed,
    )

    path = f"{sf_dir}/events.parquet"
    set_nanos_conf_if_needed(spark, path)
    # the digest keys on source mtime+size as well as path: if the
    # events file is regenerated in place, the staged dir name changes
    # and the copies are rebuilt instead of silently streaming stale
    # data from a prior staging
    # the table may be a single file (the shipped testdata) or a
    # Spark-written DIRECTORY of part files — stage the actual data files
    # either way (flat, so the file stream sees no partition-dir layout)
    if os.path.isdir(path):
        srcs = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        srcs = [path]
    st = os.stat(path)
    sizes = ":".join(str(os.stat(s).st_size) for s in srcs)
    # "v2" = the flat copy_{i}_{j} naming; a digest that collides with the
    # pre-directory-support scheme would mix both generations of copies in
    # one staged dir and over-deliver replays
    digest = hashlib.sha256(
        f"dupv2-{copies}:{path}:{st.st_mtime_ns}:{sizes}".encode()
    ).hexdigest()[:16]
    d = os.path.join(tempfile.gettempdir(), f"stream_dup_{digest}")
    os.makedirs(d, exist_ok=True)
    for i in range(copies):
        for j, src in enumerate(srcs):
            dst = os.path.join(d, f"copy_{i}_{j}.parquet")
            if not os.path.exists(dst):
                shutil.copyfile(src, dst)
    schema = spark.read.parquet(path).schema
    raw = file_stream(spark, d, schema)
    return normalize_event_ts(raw)
