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

from pyspark.sql import DataFrame

_COUNTER = itertools.count()


def run_available_now(
    stream_df: DataFrame, output_mode: str, timeout_s: int = 300
) -> DataFrame:
    """Execute to completion under AvailableNow; return the memory-sink
    table. Query names are generated so repeated runs in one session never
    collide."""
    name = f"__stream_result_{next(_COUNTER)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # awaitTermination returns False on timeout — a partially-filled
        # sink table must surface as an error, never as a silently
        # truncated result.
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"streaming query {name!r} did not drain within {timeout_s}s"
            )
    finally:
        q.stop()
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
