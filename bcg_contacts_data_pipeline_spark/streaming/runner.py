"""Deterministic finite execution of a streaming plan.

`run_available_now` runs a streaming DataFrame with Trigger.AvailableNow
into a memory sink and returns the sink table as a batch DataFrame. This
is how streaming operators plug into the driver contract (`queries()`
callables must return a DataFrame): the stream processes everything
currently in the source, terminates, and the accumulated sink content is
the result. On a finite input this is semantically a batch run of the
same plan, which is exactly what makes the DuckDB oracles applicable.

The memory sink collects results to the driver — it is a TEST/ORACLE
sink only. Production streams write to files/Kafka/Delta with a durable
checkpoint; pass any other sink straight to `df.writeStream` yourself.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

_COUNTER = itertools.count()


def _ephemeral_checkpoint_dir() -> str:
    """Checkpoint root for finite memory-sink drains: tmpfs when the host
    has one (state-store + offset/commit log writes become memory writes
    — measured ~0.15 s/query at sf0.1), else the normal temp dir. The
    memory sink is non-durable by definition, so a durable checkpoint
    buys nothing here; `run_to_files` (the production shape) keeps its
    caller-provided durable checkpoint."""
    root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix="stream_ckpt_", dir=root)


def run_available_now(
    stream_df: DataFrame,
    output_mode: str,
    timeout_s: int = 300,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Execute to completion under AvailableNow; return the memory-sink
    table. Query names are generated so repeated runs in one session never
    collide.

    ``shuffle_partitions``: scoped override of the session's shuffle
    partition count for THIS drain (restored afterwards). Every stateful
    streaming operator initializes one state store per shuffle partition
    — per-query fixed cost that dwarfs the data cost on a finite test
    drain (measured at sf0.1: 32 partitions ≈ 1.4 s/query, 8 ≈ 0.85 s;
    4 measured within noise of 8 for JVM-stateful shapes but 1.2x
    SLOWER for the applyInPandasWithState drains, whose per-partition
    Python workers want the parallelism — so the registry stays at 8,
    identical results). Size it to the drain's state volume; leave None
    to inherit the session setting (what a production stream does).
    """
    spark = stream_df.sparkSession
    name = f"__stream_result_{next(_COUNTER)}"
    # Everything after the conf override / tmpdir creation runs inside
    # the try: if .start() itself raises (unsupported plan + output-mode
    # combination, unwritable checkpoint root), the finally still
    # restores the session conf and removes the orphan checkpoint dir.
    ckpt = None
    prev_parts = None
    q = None
    try:
        ckpt = _ephemeral_checkpoint_dir()
        if shuffle_partitions is not None:
            prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(shuffle_partitions)
            )
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        # awaitTermination returns False on timeout — a partially-filled
        # sink table must surface as an error, never as a silently
        # truncated result.
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"streaming query {name!r} did not drain within {timeout_s}s"
            )
    finally:
        if q is not None:
            q.stop()
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if ckpt is not None:
            shutil.rmtree(ckpt, ignore_errors=True)
    return stream_df.sparkSession.table(name)


def run_to_files(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    output_mode: str = "append",
    timeout_s: int = 300,
) -> None:
    """Durable file sink under AvailableNow: the production shape —
    exactly-once via the checkpoint's offset/commit log; re-running after
    a crash resumes from the last committed batch instead of
    reprocessing. (Memory sink above is for tests/oracles only.)"""
    q = (
        stream_df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"streaming file sink at {path!r} did not drain within {timeout_s}s"
            )
    finally:
        q.stop()


def idempotent_batch_writer(path: str, fmt: str = "parquet"):
    """foreachBatch function for exactly-once file output: each
    micro-batch overwrites its OWN directory (``path/batch_id=<id>``),
    so a redelivered batch (foreachBatch's contract is at-least-once —
    a crash between the sink write and the commit-log write replays the
    batch) replaces its previous output instead of appending
    duplicates. Readers load ``path`` with hive partition discovery and
    see each batch exactly once. The same replace-by-batch_id recipe is
    how foreachBatch feeds sinks with no native streaming writer —
    JDBC upserts (compose with cdc.upsert_latest), REST, search
    indexes."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").format(fmt).save(
            f"{path}/batch_id={batch_id}"
        )

    return write


def run_foreach_batch(
    stream_df: DataFrame,
    batch_fn,
    checkpoint: str,
    output_mode: str = "update",
    timeout_s: int = 300,
) -> None:
    """Drain a stream under AvailableNow through ``foreachBatch`` — the
    escape hatch for sinks Structured Streaming has no native writer
    for. Exactly-once only when ``batch_fn`` is idempotent per batch_id
    (see ``idempotent_batch_writer``); the checkpoint's commit log
    guarantees a batch is never SKIPPED, idempotency guarantees a
    replayed batch is never DOUBLED."""
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"foreachBatch stream did not drain within {timeout_s}s"
            )
    finally:
        q.stop()
