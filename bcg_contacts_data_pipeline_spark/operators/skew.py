"""Explicit skew mitigation: salted two-phase aggregation and salted
broadcast join.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
these operators are for the cases you know about at plan time — the
reference's empty-dedup-key pile-up (SURVEY §4: every keyless contact
lands in ONE group) is the canonical example. A hot key turns one
reducer into the straggler that bounds the whole stage; salting fans the
hot key across ``salt_buckets`` reducers and recombines.

Semantics are identical to the unsalted operator — the oracle for a
salted aggregation is the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salting.

    ``aggs`` maps output column -> (partial_fn, final_fn, input_col):
    e.g. ``{"n": (F.count, F.sum, F.lit(1)), "total": (F.sum, F.sum,
    F.col("v")), "mx": (F.max, F.max, F.col("v"))}``. Phase 1 groups by
    (keys + salt) — the hot key's rows spread over ``salt_buckets``
    reducers; phase 2 combines the per-salt partials per key. Only
    decomposable aggregates (sum/count/min/max and friends) fit this
    shape — exactly the ones whose partials Spark already pushes map-side
    for NON-skewed keys; salting extends that to the reduce side.
    """
    salted = df.withColumn("__salt", _content_salt(df, salt_buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            pfn(inp).alias(f"__p_{out}")
            for out, (pfn, _ffn, inp) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            ffn(F.col(f"__p_{out}")).alias(out)
            for out, (_pfn, ffn, inp) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact-to-dim equi-join: salt the fact side, EXPLODE the dim
    side across all salt values, join on (key, salt). The dim replicates
    ``salt_buckets``-fold — use only when the dim is small enough for
    that (it usually is: skew problems are fact-side) and the dim is too
    large or the join type unsuited for a plain broadcast."""
    f = fact.withColumn("__salt", _content_salt(fact, salt_buckets))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return f.join(d, [on, "__salt"], how).drop("__salt")


def _content_salt(df: DataFrame, salt_buckets: int) -> Column:
    """Deterministic salt from row content — NOT ``F.rand``: a
    non-deterministic expression evaluated before a shuffle re-salts rows
    differently when a task retries or a partition recomputes, the
    classic Spark hazard that can drop or double-count rows mid-stage.
    A full-row hash spreads a hot key just as uniformly for distinct rows
    and stays stable under recomputation. Limitation: bit-identical
    duplicate rows share a bucket; if a hot key is millions of IDENTICAL
    rows, pre-aggregate them (a map-side combine already does) or add a
    distinguishing column before salting."""
    return F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in df.columns])),
        F.lit(salt_buckets),
    ).cast("int")
