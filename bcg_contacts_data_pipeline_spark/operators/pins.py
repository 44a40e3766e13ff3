"""Scoped persist pins — targeted release for operators that must cache.

Several operators persist an intermediate frame as part of their
correctness contract (renumber / global_running_sum freeze a sampled
range partitioning; the LSH operators share signature frames between
band-bucketing and verify). Those pins must survive until the CALLER
materializes the operator's output — the operator itself can never know
when that is — so historically they lived until `clearCache()`, which in
a long-lived session running many pipelines is a slow storage-memory
leak (advisor flag, round 4).

`PinScope` is the handle that closes that loop: the caller owns one,
passes it down, and releases exactly the pins its plan created once its
sinks have run — no session-wide `clearCache()`, no foreign caches
touched. Operators accept ``pins=None`` and fall back to the old
session-lifetime behavior so short-lived callers (bench, tests, the
driver's one-shot queries) need no ceremony.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class PinScope:
    """Collects the frames an operator pins so the caller can unpersist
    exactly those once its outputs are materialized.

    Usable as a context manager; pins release on exit. Release is
    idempotent and non-blocking (executors drop blocks asynchronously).
    """

    def __init__(self) -> None:
        self._frames: list[tuple[DataFrame, object | None]] = []

    def pin(self, df: DataFrame) -> DataFrame:
        """Persist ``df`` (default MEMORY_AND_DISK, same as .cache())
        and remember it for release."""
        df.persist()
        self._frames.append((df, None))
        return df

    def adopt(self, df: DataFrame, releaser=None) -> DataFrame:
        """Register an ALREADY-materialized frame (e.g. a
        ``localCheckpoint``) for release without re-persisting it.
        ``releaser(df)`` is called at release time when given (a
        checkpointed frame's blocks are not freed by
        ``DataFrame.unpersist`` — the owner passes the routine that
        does); defaults to ``df.unpersist``."""
        self._frames.append((df, releaser))
        return df

    def __len__(self) -> int:
        return len(self._frames)

    def release(self, blocking: bool = False) -> None:
        frames, self._frames = self._frames, []
        for df, releaser in frames:
            if releaser is not None:
                releaser(df)
            else:
                df.unpersist(blocking=blocking)

    def __enter__(self) -> "PinScope":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def pin(df: DataFrame, pins: PinScope | None) -> DataFrame:
    """Persist ``df`` into ``pins`` when a scope is given, else with the
    legacy session-lifetime contract (caller releases via clearCache)."""
    if pins is not None:
        return pins.pin(df)
    return df.persist()
